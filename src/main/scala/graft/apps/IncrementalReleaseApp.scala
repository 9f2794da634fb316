package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.SimilarityOps
import graft.queries.{SimilarityQueries, TextQueries}

/** INCREMENTAL corpus release — append a document delta to an existing
  * release without rescanning the base corpus.
  *
  * At 100 TB the corpus doesn't arrive once; it arrives as a daily
  * delta, and rebuilding the release from scratch per delta is the
  * operation that doesn't scale. This app keeps APPEND-ONLY sidecar
  * indexes next to the release and processes ONLY the delta against
  * them:
  *
  *   - `fps`      — fingerprints seen (exact-dedup gate: a delta doc
  *                  whose fp is already indexed can never be canonical);
  *   - `bands`    — every document's MinHash band signatures (near-dup
  *                  gate: delta candidates come from band-bucket
  *                  collisions against base ∪ delta);
  *   - `shingles` — per-document shingle arrays (exact-Jaccard verify of
  *                  the rare candidates — the shingle index);
  *   - `totals`   — per-(split, bucket) token totals (the packing cumsum
  *                  CONTINUES from them);
  *   - `meta`     — max doc_id released (monotonicity guard).
  *
  * Equality guarantee (spec-asserted byte-for-byte):
  * `append(releaseAll(A), B) == releaseAll(A ∪ B)` whenever
  *   1. delta ids exceed all base ids (ingest order — `require`d), and
  *   2. no band bucket holding ≥ 2 base documents crosses the flood cap
  *      when the delta lands (`require`d; crossing would retroactively
  *      change base verdicts, which an append cannot do — rebuild).
  * Every downstream stage (sample/mix/split/pack) is a pure per-document
  * function, so base rows are FINAL: the append never rewrites a base
  * file, and all index updates are parquet appends — O(delta) work,
  * O(delta) writes, regardless of base size.
  *
  * The benchmark is FIXED (a real eval set does not grow with the
  * corpus) and passed in explicitly — its shingle length must match the
  * release's (require'd).
  */
object IncrementalReleaseApp {

  private val K = SimilarityQueries.minhashK
  private val B = SimilarityQueries.bandSize
  private val N = SimilarityQueries.shingleN
  private val Thresh = SimilarityQueries.jaccardThreshold
  private val Cap = 1000 // candidatePairs' flood cap (same constant)

  // ------------------------------------------------------------ full build

  /** Batch build over `docs` + static benchmark: writes the release to
    * `outDir` and the sidecar indexes to `indexDir`. */
  def releaseAll(spark: SparkSession, docs: DataFrame,
                 bench: StreamingDecontamApp.Benchmark,
                 outDir: String, indexDir: String): Unit = {
    require(bench.shingleN == N,
      s"benchmark shingle length ${bench.shingleN} != release's $N")
    val sets = SimilarityOps.shingleSets(docs, col("doc_id"), col("text"), N)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = SimilarityOps.lshBands(
      SimilarityOps.minhashSignature(sets, K), K, B)
    val losers = SimilarityOps.jaccardVerify(
        SimilarityOps.candidatePairs(bands, Cap), sets, Thresh)
      .select(col("b").as("doc_b")).distinct()
    val packed = packKept(docs, sets, losers, bench, baseTotals = None)
    CorpusReleaseApp.writeRelease(packed, outDir, mode = "overwrite")
    writeIndex(docs, sets, bands, packed, indexDir, mode = "overwrite")
    sets.unpersist()
  }

  // --------------------------------------------------------------- append

  /** Append `delta` to the release at `outDir` using ONLY the delta and
    * the sidecar indexes — the base corpus is not an input. */
  def append(spark: SparkSession, delta: DataFrame,
             bench: StreamingDecontamApp.Benchmark,
             outDir: String, indexDir: String): Unit = {
    require(bench.shingleN == N,
      s"benchmark shingle length ${bench.shingleN} != release's $N")
    val maxBase = spark.read.parquet(s"$indexDir/meta")
      .agg(max(col("max_doc_id"))).head.getLong(0)
    val minDelta = delta.agg(min(col("doc_id"))).head.getLong(0)
    require(minDelta > maxBase,
      s"delta ids must exceed the released max ($minDelta <= $maxBase): " +
        "append-only equality needs monotone ingest order")

    val dsets = SimilarityOps.shingleSets(delta, col("doc_id"), col("text"), N)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dbands = SimilarityOps.lshBands(
        SimilarityOps.minhashSignature(dsets, K), K, B)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idxBands = spark.read.parquet(s"$indexDir/bands")

    // ---- near-dup: candidates = band-bucket collisions with the DELTA
    // on the loser (greater-id) side, capped on the UNION bucket size —
    // exactly the pairs a full rebuild would consider with b ∈ delta.
    val unionCounts = idxBands.select("band", "sig")
      .union(dbands.select("band", "sig"))
      .groupBy("band", "sig").agg(count(lit(1)).as("__bc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // guard 2: a delta that pushes a bucket holding >= 2 base docs over
    // the cap would retroactively drop base-base pairs in a rebuild —
    // the one shape an append cannot reproduce
    val flooded = idxBands.groupBy("band", "sig")
      .agg(count(lit(1)).as("__base"))
      .filter(col("__base") >= 2 && col("__base") <= Cap)
      .join(unionCounts.filter(col("__bc") > Cap), Seq("band", "sig"))
      .count()
    require(flooded == 0,
      s"$flooded band buckets shared by base documents would cross the " +
        "flood cap — base verdicts would change; rebuild instead")
    val okBuckets = unionCounts.filter(col("__bc") <= Cap).select("band", "sig")
    val partners = idxBands.union(dbands)
      .join(okBuckets, Seq("band", "sig"))
      .select(col("band"), col("sig"), col("__id").as("a"))
    val dside = dbands.join(okBuckets, Seq("band", "sig"))
      .select(col("band"), col("sig"), col("__id").as("b"))
    val cand = partners.join(dside, Seq("band", "sig"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
    // verify against the shingle index (base) ∪ the delta's own frame
    val allSets = spark.read.parquet(s"$indexDir/shingles")
      .select(col("doc_id").as("__id"), col("sh").as("__sh"))
      .union(dsets)
    val dlosers = SimilarityOps.jaccardVerify(cand, allSets, Thresh)
      .select(col("b").as("doc_b")).distinct()

    // ---- exact dedup across the boundary: a delta doc whose fp is
    // already indexed can never be canonical (base ids are smaller).
    // Dups are dropped BEFORE packing — in the pack they would shift the
    // cumsum and every later delta row's seq_id. Bands/shingles/fps above
    // still cover the FULL delta (a rebuild's pair search sees dup docs
    // too, and they can make other docs losers).
    val idxFps = spark.read.parquet(s"$indexDir/fps").distinct()
    val dupOfBase = delta
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .join(idxFps, "fp").select("doc_id")
    val freshDelta = delta.join(dupOfBase, Seq("doc_id"), "left_anti")

    val baseTotals = spark.read.parquet(s"$indexDir/totals")
      .groupBy("split", "bucket")
      .agg(sum(col("wc_sum")).as("total_wc"))
    val packed = packKept(freshDelta, dsets, dlosers, bench,
      baseTotals = Some(baseTotals))
    CorpusReleaseApp.writeRelease(packed, outDir, mode = "append")
    writeIndex(delta, dsets, dbands, packed, indexDir, mode = "append")
    dsets.unpersist(); dbands.unpersist(); unionCounts.unpersist()
  }

  // -------------------------------------------------------------- takedown

  /** Retract documents from the release (takedown / opt-out — the
    * right-to-be-forgotten operation a living corpus must support
    * without a rebuild): rewrites ONLY the parquet files that contain
    * the target rows (split-directory pruning + per-file containment),
    * leaving every other file byte-untouched — O(files-hit), not
    * O(release).
    *
    * Semantics the spec pins down:
    *  - retracted rows vanish; all other rows are exactly preserved —
    *    packed sequence ids keep their values, so retraction leaves
    *    HOLES in sequences rather than repacking (consumers already
    *    tolerate short sequences; repacking would rewrite the world);
    *  - the packing TOTALS keep counting retracted tokens — later
    *    appends land exactly where they would have anyway;
    *  - the fingerprint index keeps the retracted fp: a byte-identical
    *    future copy of a taken-down document must NOT re-enter the
    *    release (takedown is a verdict, not an eviction). */
  def retract(spark: SparkSession, docIds: Seq[Long], outDir: String,
              indexDir: String): Unit = {
    import org.apache.spark.sql.functions.{col => c}
    if (docIds.isEmpty) return
    // a document's split is a pure function of its id, so the discovery
    // scan partition-prunes to the target docs' split directories before
    // the pushed doc_id filter does the row-group work
    val splits = docIds.map { id =>
      val h = graft.functions.StableHash.stable60Local(id.toString) % 100
      if (h < 80) "train" else if (h < 90) "validation" else "test"
    }.distinct
    val hit = spark.read.parquet(outDir)
      .filter(c("split").isin(splits: _*) && c("doc_id").isin(docIds: _*))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)) // bounded: ≤ |docIds| × epochs files
    if (hit.isEmpty) return
    // rewrite each hit file minus the targets, then swap — per-file, so
    // a file's split value is implicit in its directory (re-derive it
    // from the path for the rewritten rows' location)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    hit.foreach { f =>
      val path = new org.apache.hadoop.fs.Path(new java.net.URI(f))
      val dir = path.getParent // .../split=<s>
      val kept = spark.read.parquet(f)
        .filter(!c("doc_id").isin(docIds: _*))
      // one file in, one file out: keep the layout contract (rows were
      // sorted by (bucket, seq_id) within the file; the filter preserves
      // order on a single-file single-partition read)
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s".retract-${path.getName}")
      kept.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no output for $f"))
      fs.delete(path, false)
      fs.rename(part, new org.apache.hadoop.fs.Path(dir, path.getName))
      fs.delete(tmp, true)
    }
  }

  // ------------------------------------------------------------- streaming

  /** The STREAMING release: documents arrive as a stream (monotone ids —
    * ingest order), and every micro-batch [[append]]s incrementally, so
    * the release and its indexes are valid, queryable state after each
    * batch — the corpus-release pipeline is no longer a nightly job.
    * Bootstrap with [[releaseAll]] over the day-0 backfill first.
    *
    * Crash contract: a replayed micro-batch fails the monotonicity
    * `require` LOUDLY instead of double-appending (the ids are already
    * released) — corruption is impossible, resumption after a mid-append
    * crash is operator-driven. Production would stage the release+index
    * writes behind one manifest commit; that machinery is out of scope
    * here and the abort-don't-corrupt behavior is spec-visible. */
  def stream(docs: DataFrame, bench: StreamingDecontamApp.Benchmark,
             outDir: String, indexDir: String,
             checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (batch.limit(1).count() > 0)
          append(batch.sparkSession, batch, bench, outDir, indexDir)
      }
      .start()

  // --------------------------------------------------------------- shared

  /** clean (quality + canon + injected losers) → decontaminate (static
    * bench) → sample/mix/split/pack — identical stages for the full
    * build and the delta (the fp window spans the given docs; the
    * cross-boundary fp gate is the caller's anti-join). */
  private def packKept(docs: DataFrame, sets: DataFrame, losers: DataFrame,
                       bench: StreamingDecontamApp.Benchmark,
                       baseTotals: Option[DataFrame]): DataFrame = {
    val clean = TextQueries.cleanCorpusDocs(docs, losers)
    val sh = sets.select(col("__id").as("doc_id"),
      explode(array_distinct(col("__sh"))).as("s"))
    val contaminated = TextQueries
      .overlapAgainstBench(sh, bench.rows, bench.minOverlap)
      .select("doc_id").distinct()
    val kept = clean
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(docs.select(col("doc_id"), col("source"),
        TextFunctions.wordCount(col("text")).as("wc")), "doc_id")
    CorpusReleaseApp.sampleMixSplitPack(kept, baseTotals)
  }

  /** All index updates are parquet APPENDS (overwrite only on the full
    * build): fps may repeat across batches (consumers `distinct`),
    * totals accumulate per-batch sums (consumers re-aggregate) — the
    * same append-only discipline as the release rows themselves. */
  private def writeIndex(docs: DataFrame, sets: DataFrame, bands: DataFrame,
                         packed: DataFrame, indexDir: String,
                         mode: String): Unit = {
    docs.select(TextFunctions.fingerprint(col("text")).as("fp")).distinct()
      .write.mode(mode).parquet(s"$indexDir/fps")
    bands.write.mode(mode).parquet(s"$indexDir/bands")
    sets.select(col("__id").as("doc_id"), col("__sh").as("sh"))
      .write.mode(mode).parquet(s"$indexDir/shingles")
    packed.groupBy("split", "bucket").agg(sum(col("wc")).as("wc_sum"))
      .write.mode(mode).parquet(s"$indexDir/totals")
    docs.agg(max(col("doc_id")).as("max_doc_id"))
      .write.mode(mode).parquet(s"$indexDir/meta")
  }
}
