package graft.apps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.BloomFilter

import graft.operators.SimilarityOps
import graft.sources.Tables

/** Streaming decontamination — c4's Bloom form as the IN-FLIGHT stage of
  * the corpus-release pipeline.
  *
  * The asymmetry that makes this the natural streaming shape: the
  * BENCHMARK is static (a fixed eval set), the CORPUS is the thing in
  * motion. So the benchmark's df-guarded shingles and their Bloom bits
  * are built once, batch-side, and broadcast; documents arrive as a
  * stream; each micro-batch shingles its documents map-side, probes the
  * bits (no false negatives ⇒ nothing contaminated can slip through the
  * prefilter), and exact-joins only the survivors against the benchmark
  * rows to kill Bloom's false positives. A document's verdict depends
  * only on itself + the static benchmark, so the stream's verdicts equal
  * the batch pipeline's on the same corpus, regardless of batch
  * boundaries — asserted stream==batch in `StreamingDecontamSpec`.
  *
  * Replayed micro-batches overwrite their own `__batch` partition
  * (idempotent restart, same contract as `Sinks.streamDynamic`).
  */
object StreamingDecontamApp {

  /** The static benchmark side: df-guarded shingle rows + Bloom bits.
    * Mirrors c4's parameters (`TextQueries.c4BloomDecontaminate`):
    * 4-gram shingles, benchmark = doc_id % 29, pair overlap ≥ 2. */
  final case class Benchmark(rows: DataFrame, bloom: BloomFilter,
                             shingleN: Int, minOverlap: Int)

  def benchmark(spark: SparkSession, sfDir: String,
                shingleN: Int = 4, benchMod: Int = 29,
                minOverlap: Int = 2): Benchmark =
    benchmarkFrom(Tables.documents(spark, sfDir), shingleN, benchMod, minOverlap)

  /** [[benchmark]] over an explicit reference-corpus frame — the
    * incremental release builds its FIXED eval benchmark from the base
    * corpus only. */
  def benchmarkFrom(docs: DataFrame, shingleN: Int, benchMod: Int,
                    minOverlap: Int): Benchmark = {
    val sh = SimilarityOps.shingleSets(
        docs, col("doc_id"), col("text"), shingleN)
      .select(col("__id").as("doc_id"),
        explode(array_distinct(col("__sh"))).as("s"))
    // same df ≤ 1000 stop-n-gram guard as the batch pipeline — computed
    // against the REFERENCE corpus at benchmark-build time, so streamed
    // documents can never shift the benchmark side
    val rare = sh.groupBy("s")
      .agg(count(lit(1)).as("__df")).filter(col("__df") <= 1000).select("s")
    val bench = sh.filter(col("doc_id") % benchMod === 0)
      .select(col("doc_id").as("bench_id"), col("s"))
      .join(rare, "s")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Benchmark(bench, bench.stat.bloomFilter("s", 200000L, 0.01),
      shingleN, minOverlap)
  }

  /** Filter a streaming `(doc_id, text, …)` frame against the benchmark;
    * surviving documents append to `outDir` (partitioned by micro-batch
    * for idempotent replay). */
  def run(docs: DataFrame, bm: Benchmark, outDir: String,
          checkpoint: String): StreamingQuery = {
    val bloomB = docs.sparkSession.sparkContext.broadcast(bm.bloom)
    // the one sanctioned UDF shape (see c4): a broadcast bitset probe has
    // no builtin Column form
    val mightContain =
      udf((x: String) => x != null && bloomB.value.mightContainString(x))
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sh = SimilarityOps.shingleSets(
            batch, col("doc_id"), col("text"), bm.shingleN)
          .select(col("__id").as("doc_id"),
            explode(array_distinct(col("__sh"))).as("s"))
        // Bloom prefilter map-side, then the shared exact-overlap core
        // (kills Bloom's false positives)
        val contaminated = graft.queries.TextQueries.overlapAgainstBench(
            sh.filter(mightContain(col("s"))), bm.rows, bm.minOverlap)
          .select("doc_id").distinct()
        batch.join(contaminated, Seq("doc_id"), "left_anti")
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch")
          .parquet(outDir)
      }
      .start()
  }
}
