package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the cheapest query is the one
  * that never reads the data.
  *
  * At 100 TB the dominant cost of most queries is the scan, and the two
  * scan-side levers Spark gives a table owner are:
  *
  *  1. **Partition pruning**: directory-level `partitionBy(col)` — a
  *     filter on the partition column eliminates whole directories at
  *     PLANNING time (visible as the plan's partition-count, before a
  *     single byte is read).
  *  2. **Row-group skipping**: `sortWithinPartitions(col)` clusters
  *     values so parquet min/max statistics make pushed filters
  *     (`PushedFilters` in the plan) skip most row-groups of each file.
  *
  * The reference has no layout layer (Kafka topics + KV stores); this is
  * the warehouse-side capability its Doris sink delegated to Doris'
  * partitioned tables (`util/DorisUtil.java:23-48` ships rows; Doris
  * partitions them). On Spark the table layout IS the engine's job.
  *
  * Layout invariance: rewriting a table through `writePartitioned`
  * changes bytes-on-disk arrangement only — `LayoutSpec` asserts the
  * row multiset is unchanged and that pruning actually removes
  * partitions from the scan.
  */
object Layout {

  /** Rewrite `df` date-partitioned by `day=yyyy-MM-dd` (from `tsCol`),
    * values clustered by `clusterCol` inside each partition. One shuffle
    * (repartition by day) so each partition directory is written by the
    * tasks owning it — without it every task writes a sliver of every
    * day and the table fragments into O(tasks × days) small files (the
    * classic small-file problem at scale). */
  def writePartitionedByDay(df: DataFrame, tsCol: String, clusterCol: String,
                            outDir: String): Unit =
    df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("day"))
      // day leads the sort: the file writer requires local ordering on
      // the partition column, so sorting (day, cluster) satisfies it in
      // ONE pass — sorting by cluster alone would make the writer add a
      // second sort on day, and the clustering would then survive only
      // by sort stability
      .sortWithinPartitions(col("day"), col(clusterCol))
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(outDir)

  /** Read back a day-partitioned table. */
  def readPartitioned(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)

  /** Morton (Z-order) interleave of two `bits`-bit values: result bit
    * `2i` is bit `i` of `a`, bit `2i+1` is bit `i` of `b`. Pure integer
    * arithmetic — codegen'd, deterministic, engine-portable. */
  private[graft] def zInterleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(1) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(1) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Rewrite `df` clustered on the Z-ORDER curve of TWO columns — the
    * layout for tables filtered by either (or both) of two dimensions.
    *
    * A single-column sort gives one dimension tight per-file min/max
    * ranges and leaves the other spanning the whole domain in every file
    * (no skipping). The space-filling curve trades a little locality on
    * each axis for locality on BOTH: each file covers a small rectangle
    * of the (a, b) plane, so parquet min/max stats prune files/row-groups
    * for predicates on either column — `LayoutSpec` measures exactly
    * this, against the single-sort layout as the control.
    *
    * Values map onto the curve by linear min/max scaling to `bits`-bit
    * grid cells (one extra stats pass), or — `rankScaled = true` — by
    * QUANTILE boundaries (one GK-sketch pass, t10's machinery): a
    * zipfian column collapses most rows into a handful of linear grid
    * cells and the curve loses locality on that axis, while rank cells
    * hold equal row counts by construction and keep pruning selective
    * under any marginal distribution (`LayoutSpec` measures the gap).
    * Rank mode clamps `bits` to 8 (the per-row boundary fold is
    * 2^bits - 1 comparisons); the default works in both modes.
    * The curve value is sort-only — never materialized into the files. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    outDir: String, bits: Int = 16,
                    numFiles: Option[Int] = None,
                    rankScaled: Boolean = false): Unit = {
    def linear(c: String, lo: Long, hi: Long): Column = {
      // Driver-computed integer scale instead of the previous
      // multiply-then-divide: (v - lo) · 2^bits overflows Long once the
      // span reaches 2^(63-bits) — epoch-microsecond spans qualify —
      // silently scrambling the curve. Span arithmetic runs in BigInt
      // (hi - lo + 1 itself wraps Long when a MinValue sentinel meets
      // positive values), and the wide branch divides BEFORE
      // subtracting (v div step − lo div step: monotone, ≥ 0, clamped)
      // so no row-side expression can overflow either. A narrow span
      // MULTIPLIES up to the grid instead (the product stays < 2^bits),
      // because BOTH columns must fill the same bit-width or the
      // interleave degenerates into a plain sort on the wider column.
      val cells = BigInt(1) << bits
      val span = (BigInt(hi) - BigInt(lo) + 1).max(BigInt(1))
      val v = s"coalesce(cast(`$c` as bigint), ${lo}L)"
      if (span >= cells) {
        val step = ((span + cells - 1) / cells).toLong // ≤ 2^(64-bits)
        expr(s"least(($v div ${step}L) - (${lo}L div ${step}L), " +
          s"${(1L << bits) - 1}L)")
      } else expr(s"($v - ${lo}L) * ${(cells / span).toLong}L")
    }
    val z = if (rankScaled) {
      // rank scaling materializes 2^bits - 1 quantile boundaries per
      // column (each row folds over them), so rank mode caps the grid
      // at 8 bits. ONLY the default width (16 — right for linear mode)
      // clamps silently: making rankScaled=true throw under the default
      // was an API footgun, but a caller who EXPLICITLY asks for a
      // 9..15 or 17+ bit rank grid must hear "no" loudly rather than
      // get a grid up to 256x coarser than requested
      require(bits <= 8 || bits == 16,
        s"rankScaled supports at most 8 bits (got $bits); " +
          "only the default 16 clamps")
      val rbits = math.min(bits, 8)
      val cells = 1 << rbits
      // ONE Greenwald–Khanna pass sketches both columns
      val bounds = df.stat.approxQuantile(Array(colA, colB),
        (1 until cells).map(_.toDouble / cells).toArray, 1.0 / (4 * cells))
      zInterleave(rankCell(colA, bounds(0)), rankCell(colB, bounds(1)), rbits)
    } else {
      val r = df.agg(
        min(col(colA)).cast("long"), max(col(colA)).cast("long"),
        min(col(colB)).cast("long"), max(col(colB)).cast("long")).head
      // an empty frame or all-null column aggregates to null min/max:
      // treat as a one-point domain (every row lands in cell 0) rather
      // than NPE — the write still round-trips the rows unchanged
      def at(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
      zInterleave(linear(colA, at(0), at(1)), linear(colB, at(2), at(3)),
        bits)
    }
    // numFiles pins the curve-segment count (one file ≈ one rectangle of
    // the plane); default lets range partitioning + AQE size them
    numFiles.map(df.repartitionByRange(_, z)).getOrElse(df.repartitionByRange(z))
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Grid cell of `c` by RANK: the count of quantile boundaries ≤ the
    * value (a codegen'd fold over a literal boundary array — 2^bits - 1
    * comparisons per row, why rank mode caps `bits`). Nulls sort into
    * cell 0 like linear scaling's `coalesce(lo)`. */
  private def rankCell(c: String, bounds: Array[Double]): Column =
    aggregate(array(bounds.map(lit): _*), lit(0L), (acc, b) =>
      acc + when(col(c).cast("double") >= b, 1L).otherwise(0L))

  /** Count of partition directories the physical plan will actually
    * read for `df` (after partition pruning). Diagnostic used by
    * LayoutSpec to prove pruning happened at planning time. */
  def scannedPartitions(df: DataFrame): Long = {
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    require(scans.nonEmpty, "no file scan in plan")
    scans.map(f => f.relation.location.listFiles(
      f.partitionFilters, f.dataFilters).size.toLong).sum
  }
}
