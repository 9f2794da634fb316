package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join patterns from the reference, Spark-first.
  *
  *  - J1/J2 stream-stream equi/left joins → plain Catalyst joins (batch) or
  *    watermarked stream-stream joins (streaming pipelines).
  *  - J3 lookup (temporal) join `FOR SYSTEM_TIME AS OF pt`
  *    (`app/dwd/DwdInterationCommentInfo.java:64-78`) → broadcast hash join
  *    against the dim snapshot; the per-record async/thread-pool/Redis
  *    machinery of J6/J7/J8 (`app/dws/func/AddDim*`) collapses into the
  *    same broadcast join — Catalyst chains N of them without extra
  *    shuffles because the fact side's partitioning is untouched.
  *  - J4 interval join (`app/dwd/DwdTradePayDetailSuc.java:100-127`) →
  *    equi-join on the key + range predicate on the time columns; Spark
  *    plans it as a hash join with a residual filter, so cost stays
  *    O(matches-per-key), not O(cartesian).
  *
  * Scale notes: only dims declared `tiny` (bounded cardinality independent
  * of scale factor — region, nation, a config table) carry a `broadcast()`
  * hint. Dims that GROW with the data (part, supplier, customer) must NOT
  * be force-broadcast — at 100 TB a forced broadcast of a multi-GB dim
  * OOMs every executor. For those, Catalyst + AQE decide at runtime from
  * actual sizes (`spark.sql.autoBroadcastJoinThreshold`,
  * `spark.sql.adaptive.autoBroadcastJoinThreshold`), falling back to
  * shuffled hash / sort-merge with skew-splitting. The interval join
  * shuffles both sides once on the equi-key.
  */
object JoinOps {

  /** One step of a dimension-enrichment chain.
    *
    * @param dim  the dimension table
    * @param cond join condition
    * @param keep columns to carry over from the dim side
    * @param tiny true ⇒ cardinality is bounded regardless of data scale
    *             (worth a hard broadcast hint); false ⇒ let AQE choose
    *             the physical join from runtime sizes.
    */
  final case class Dim(dim: DataFrame, cond: Column, keep: Seq[Column],
                       tiny: Boolean = false)

  /** J3/J6 — enrich facts with a chain of dimension tables. Each join is a
    * left join keyed on the fact side, so the fact table's partitioning is
    * reused across the whole chain (no intermediate shuffle of the facts
    * when dims end up broadcast). */
  def dimChain(fact: DataFrame, dims: Seq[Dim]): DataFrame =
    dims.foldLeft(fact) { case (acc, d) =>
      val rhs = if (d.tiny) broadcast(d.dim) else d.dim
      acc.join(rhs, d.cond, "left")
        .select(acc.columns.map(acc(_)) ++ d.keep: _*)
    }

  /** J4 — interval join: rows of `left` matched to rows of `right` with the
    * same key and right.ts in [left.ts + lower, left.ts + upper]. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyL: Column, keyR: Column,
                   tsL: Column, tsR: Column,
                   lower: Column, upper: Column): DataFrame =
    left.join(right,
      keyL === keyR && tsR >= tsL + lower && tsR <= tsL + upper,
      "inner")

  /** J8 — AS-OF (event-time temporal) join: each fact row is enriched
    * with the LATEST version row of its key whose `verTs` <= the fact's
    * `factTs` (inclusive), null-padded when no version precedes it — the
    * event-time form of the reference's `FOR SYSTEM_TIME AS OF` lookup
    * join (which Flink SQL runs in processing time,
    * `app/dwd/DwdInterationCommentInfo.java:64-78`).
    *
    * Shape: UNION the two inputs and forward-fill the version payload
    * with one `last(_, ignoreNulls)` window per key — ONE shuffle+sort
    * on the key, O(facts + versions), where the naive
    * join-all-preceding-versions-then-keep-max explodes by the version
    * count per key (unbounded at 100 TB: a hot dim key's history joins
    * every fact). The payload rides in ONE struct so a version row's
    * legitimately-null column is not back-filled from an older version.
    *
    * Contract: fact and version column names must be disjoint; versions
    * must be unique per (key, ts) — dedup first (`DedupOps.keepLast`) or
    * the tie survivor is undefined. At equal timestamps the version
    * sorts BEFORE the fact (inclusive as-of, DuckDB `ASOF JOIN`
    * semantics). */
  def asofJoin(facts: DataFrame, versions: DataFrame,
               factKey: Column, verKey: Column,
               factTs: Column, verTs: Column,
               payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = facts
      .withColumn("__k", factKey).withColumn("__ts", factTs)
      .withColumn("__m", lit(1))
    val v = versions
      .withColumn("__k", verKey).withColumn("__ts", verTs)
      .withColumn("__m", lit(0))
    val u = f.unionByName(v, allowMissingColumns = true)
      .withColumn("__v",
        when(col("__m") === 0, struct(payload.map(col): _*))
          .otherwise(lit(null)))
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("__vf", last(col("__v"), ignoreNulls = true).over(w))
    payload.foldLeft(
        filled.filter(col("__m") === 1)
          .drop((payload ++ Seq("__k", "__ts", "__m", "__v")): _*)) {
      (acc, p) => acc.withColumn(p, col("__vf").getField(p))
    }.drop("__vf")
  }

  /** Banded (bucketized) range join: every point joined to every
    * interval containing it — point-in-interval with NO equi-key, the
    * join class [[asofJoin]] (latest-before) and the J4 interval join
    * (equi-key + range residual) don't cover. A naive non-equi join
    * here is a nested-loop cartesian — a non-starter at scale. BANDING
    * turns it into an equi-join: points key to `value div bandWidth`,
    * each interval EXPLODES into the bands it overlaps, the join runs
    * shuffled on the band key, and a residual containment filter makes
    * it exact. A (point, interval) pair can match only in the point's
    * own band, so no dedup pass exists anywhere.
    *
    * Cost model: the interval side inflates by ⌈len/bandWidth⌉ rows —
    * pick `bandWidth` near the TYPICAL interval length so inflation is
    * O(1) per interval while each point's band holds only intervals
    * that COULD contain it. Skewed bands (a hot day) are ordinary
    * equi-join skew: AQE splits them. Both sides shuffle once; nothing
    * is broadcast (interval tables at scale — promo calendars, IP
    * ranges, sensor validity windows — can be corpus-sized).
    *
    * Domain: values must be non-negative (`div` truncates toward zero,
    * which is floor only for non-negative operands); intervals are
    * half-open `[lo, hi)` and empty ones (`hi <= lo`) are dropped
    * before the band explode (they contain nothing, and `sequence`
    * would otherwise generate a DESCENDING band list for them).
    * Callers resolve column-name collisions between the two frames
    * before joining. */
  def rangeJoinBanded(points: DataFrame, point: Column,
                      intervals: DataFrame, lo: Column, hi: Column,
                      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val p = points.withColumn("__p", point)
      .withColumn("__band", expr(s"__p div $bandWidth"))
    val iv = intervals.withColumn("__lo", lo).withColumn("__hi", hi)
      .filter(col("__hi") > col("__lo"))
      .withColumn("__band", explode(sequence(
        expr(s"__lo div $bandWidth"), expr(s"(__hi - 1) div $bandWidth"))))
    p.join(iv, Seq("__band"))
      .filter(col("__p") >= col("__lo") && col("__p") < col("__hi"))
      .drop("__band", "__p", "__lo", "__hi")
  }
}
