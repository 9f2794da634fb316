package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{StableHash, TextFunctions}
import graft.queries.TextQueries
import graft.sources.Tables

/** The full training-data RELEASE pipeline as one batch job — what a
  * data team runs before shipping a corpus snapshot:
  *
  *   1. clean     — quality + language gate, exact-dedup canonicals,
  *                  MinHash-LSH near-dup removal (the c1 pipeline)
  *   2. decontam  — drop documents sharing n-gram evidence with the
  *                  benchmark set (the c2 check, as an anti-join)
  *   3. sample    — stratified per-source downsampling (the u8 rates:
  *                  deterministic hash keep-rates per provenance source)
  *   4. mix       — per-source epoch repetition (the u9 upsampling
  *                  weights); sampling runs FIRST so repeats are never
  *                  sampled back out
  *   5. split     — deterministic train/validation/test assignment per
  *                  DOCUMENT (stable60(doc_id) % 100 → 80/10/10), so a
  *                  document's epochs can never straddle splits — the
  *                  eval-leakage invariant, spec-asserted
  *   6. pack      — token-budget sequence assignment (the u10 cumsum)
  *                  within (split, hash-bucket): sequences never cross
  *                  splits, and the cumsum window never crosses a
  *                  partition
  *   7. write     — ONE pass, partitioned by split (consumers read
  *                  their split via partition pruning, never a scan)
  *
  * Every stage is a deterministic pure function of content — two runs
  * (or two engines) produce the identical release.
  *
  * Stage 2's STREAMING twin is [[StreamingDecontamApp]]: the benchmark
  * bits build once batch-side, in-flight documents are filtered per
  * micro-batch (stream == batch, spec-asserted).
  *
  * Usage: `runMain graft.apps.CorpusReleaseApp <sfDir> <outDir>`
  */
object CorpusReleaseApp {

  private val SeqTokenBudget = 2048
  private val PackBuckets = 8

  /** The release as a DataFrame — everything but the final write.
    * Exposed so the spec can assert PLAN properties (one shared shingle
    * scan) that the written output can't show. */
  def releaseFrame(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE tokenize+shingle pass feeds BOTH the near-dup stage (losers for
    // the c1 clean gate) and the decontamination stage (c2's overlap) —
    // tokenization is the dominant map-side cost at 100 TB, and the two
    // stages use the same 3-gram shingles by construction.
    val sets = graft.operators.SimilarityOps.shingleSets(
        Tables.documents(spark, sfDir), col("doc_id"), col("text"),
        graft.queries.SimilarityQueries.shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val losers = graft.queries.SimilarityQueries.minhashPairsFrom(sets)
      .select(col("doc_b")).distinct()
    val clean = TextQueries.cleanCorpusFrom(spark, sfDir, losers)
    // same parameters as the registered c2 (3-grams, bench = id % 37,
    // overlap >= 3, broadcast-row join) — the spec's anti-containment
    // check compares against c2's own output
    val contaminated = TextQueries.decontaminationOverlapFrom(
        sets.select(col("__id").as("doc_id"),
          explode(array_distinct(col("__sh"))).as("s")),
        benchMod = 37, minOverlap = 3,
        (sh, bench) => sh.join(broadcast(bench), "s"))
      .select("doc_id").distinct()
    val kept = clean
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(Tables.documents(spark, sfDir).select(col("doc_id"),
        col("source"), TextFunctions.wordCount(col("text")).as("wc")), "doc_id")
    sampleMixSplitPack(kept, baseTotals = None)
  }

  /** Stages 3–6 (sample → mix → split → pack) over a cleaned,
    * decontaminated `(doc_id, …, source, wc)` frame. Every stage is a
    * pure per-document function, which is what makes the INCREMENTAL
    * release possible: a delta packs on top of `baseTotals` — the
    * per-(split, bucket) token totals of the already-released base — and
    * lands exactly where a full batch rerun would put it
    * ([[IncrementalReleaseApp]]). */
  private[apps] def sampleMixSplitPack(
      kept: DataFrame, baseTotals: Option[DataFrame]): DataFrame = {
    // The sampling hash is DOMAIN-SEPARATED ("sample:" prefix) from the
    // split hash below: both are bucket60(...)%100 over doc_id, and
    // reusing one hash would correlate the stages — every sampled
    // survivor (bucket < rate_pct <= 80) would land in 'train' and the
    // validation/test splits would be EMPTY (the spec asserts all three
    // splits are populated).
    val sampled = kept
      .withColumn("rate_pct", lit(20) + StableHash.stable60(col("source")) % 61)
      .filter(StableHash.bucket60(
          concat(lit("sample:"), col("doc_id").cast("string")), 100)
        < col("rate_pct"))
      .drop("rate_pct")
    val mixed = sampled
      .withColumn("rep", lit(1) + StableHash.stable60(col("source")) % 3)
      .withColumn("epoch", explode(sequence(lit(1L), col("rep"))))
      .drop("rep")
    val split = mixed
      .withColumn("__h", StableHash.bucket60(col("doc_id").cast("string"), 100))
      .withColumn("split",
        when(col("__h") < 80, "train")
          .when(col("__h") < 90, "validation").otherwise("test"))
      .drop("__h")
    val w = Window.partitionBy("split", "bucket")
      .orderBy("doc_id", "epoch")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketed = split
      .withColumn("bucket", StableHash.bucket60(
        concat(col("doc_id").cast("string"), lit(":"),
          col("epoch").cast("string")), PackBuckets))
    // the cumsum continues from the base totals (0 for a fresh release):
    // delta doc_ids sort after every base id, so base cumsums are final
    val based = baseTotals match {
      case Some(t) => bucketed.join(
        broadcast(t.select(col("split"), col("bucket"),
          col("total_wc").as("__base"))), Seq("split", "bucket"), "left")
      case None => bucketed.withColumn("__base", lit(0L))
    }
    based
      .withColumn("__bef", coalesce(col("__base"), lit(0L))
        + coalesce(sum(col("wc")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__bef div $SeqTokenBudget"))
      .drop("__bef", "__base")
  }

  /** Write with the consumer-shaped LAYOUT (cf. [[graft.sources.Layout]]):
    * `split` is a directory partition (a training job reads its split by
    * pruning, never by scanning), and within each task's files the rows
    * cluster by (bucket, seq_id) — a (bucket, sequence-range) read skips
    * row-groups via parquet min/max stats. The repartition on
    * (split, bucket) matches the packing window's own partitioning (the
    * exchange is reused, not added) and keeps each partition directory
    * written by the tasks owning it — no O(tasks × splits) small files. */
  def release(spark: SparkSession, sfDir: String, outDir: String): Unit =
    writeRelease(releaseFrame(spark, sfDir), outDir, mode = "overwrite")

  /** The layout-aware release write (shared with the incremental append,
    * which uses mode = "append" and never touches existing files). */
  private[apps] def writeRelease(packed: DataFrame, outDir: String,
                                 mode: String): Unit =
    packed
      .repartition(col("split"), col("bucket"))
      // split leads the sort: the file writer requires local ordering on
      // the partition column; (split, bucket, seq_id) satisfies it in one
      // pass (see Layout.writePartitionedByDay)
      .sortWithinPartitions(col("split"), col("bucket"), col("seq_id"))
      .write.mode(mode).partitionBy("split").parquet(outDir)

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local("graft-corpus-release")
    try release(spark, sfDir, outDir) finally spark.stop()
  }
}
