package graft.apps

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps
import graft.queries.TextQueries
import graft.sources.Tables

/** The serving hybrid's end-to-end contract: fusing the two PERSISTENT
  * indexes equals fusing the two FROM-SCRATCH arms — i.e. nothing in
  * the index plumbing (bucket pruning, snapshot reads, cell pruning,
  * quantized candidate generation + exact rerank) shifts a single
  * fused rank. */
class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val (topK, armK, k0, nprobe, rerankK) = (5, 20, 60, 2, 40)

  test("hybrid over persistent indexes == RRF of the from-scratch arms") {
    val docs = Tables.documents(spark, sf)
    val corpus = Tables.embeddings(spark, sf)
    val work = Files.createTempDirectory("hybrid").toString
    TextIndexApp.build(spark, docs, s"$work/text", nBuckets = 16)
    VectorIndexApp.build(spark, corpus, s"$work/vec", kCells = 8, iters = 2)

    val probeIds = (0L until 10L).toSeq
    val got = HybridSearchApp.query(spark, probeIds, docs, corpus,
      s"$work/text", s"$work/vec", topK, armK, k0, nprobe, rerankK)

    // from-scratch lexical arm: t15's shared scoring tail over freshly
    // tokenized frames (no index anywhere)
    val lens = docs.select(col("doc_id"),
      graft.functions.TextFunctions.wordCount(col("text")).as("len"))
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(
          graft.functions.TextFunctions.normalized(col("text")))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val qterms = tf.filter(col("doc_id") < 10)
      .select(col("doc_id").as("q_id"), col("token"))
    val lexWant = TextQueries.bm25Rank(tf, qterms, df, lens, armK)
      .select(col("q_id"), col("doc_id").as("id"), col("rnk").as("rank"))
    // from-scratch dense arm: the in-memory v7 operator with the
    // index's stored codebook (the codebook is trained state — frozen
    // by design, so "from scratch" legitimately reads it back)
    val cents = spark.read.parquet(s"$work/vec/centroids")
    val denseWant = SimilarityOps.ivfQuantizedAnn(corpus, cents,
        col("vec_id").isin(probeIds: _*), armK, nprobe, rerankK)
      .select(col("q_id"), col("vec_id").as("id"), col("rank"))
    val want = SimilarityOps.rrfFuse(lexWant, denseWant, k0, topK)
      .select(col("q_id"), col("id").as("doc_id"), col("rnk"), col("rrf_score"))

    def rows(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Int, Double)].collect().toSet
    assert(rows(got) == rows(want),
      "hybrid over the persistent indexes diverged from the from-scratch fusion")

    // the composed serving plan satisfies the mechanical invariants
    val vs = graft.plans.PlanAudit.violations(got)
    assert(vs.isEmpty, vs.mkString("\n"))
  }
}
