package graft.apps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Serving-side hybrid retrieval: one query over BOTH persistent
  * indexes — the lexical arm from [[TextIndexApp]] (BM25 over
  * bucket-pruned postings) and the dense arm from [[VectorIndexApp]]
  * (cell-pruned quantized ANN with exact rerank) — fused by
  * reciprocal-rank fusion ([[SimilarityOps.rrfFuse]], the same
  * operator the oracle-gated v13 query ships).
  *
  * This is the composition the two index apps exist FOR: every stage
  * is the already-spec-gated serving form (term-bucket pruning, cell
  * pruning, snapshot-pinned reads, the fixed-order fused float sum),
  * so the hybrid inherits each arm's scale story and adds only the
  * per-probe-constant fusion join (≤ 2·armK rows per probe).
  *
  * `docs`/`corpus` supply probe text and raw embeddings (the rerank
  * reads embeddings from `corpus`, the one thing a compact index does
  * not store); `probeIds` selects the query batch in the shared id
  * space — tiny by the serving contract of both arms. */
object HybridSearchApp {

  def query(spark: SparkSession, probeIds: Seq[Long],
            docs: DataFrame, corpus: DataFrame,
            textIdx: String, vecIdx: String,
            topK: Int, armK: Int, k0: Int,
            nprobe: Int, rerankK: Int): DataFrame = {
    val lex = TextIndexApp.query(spark,
        docs.filter(col("doc_id").isin(probeIds: _*))
          .select(col("doc_id").as("q_id"), col("text")),
        textIdx, armK)
      .select(col("q_id"), col("doc_id").as("id"), col("rnk").as("rank"))
    val dense = VectorIndexApp.query(spark, corpus, vecIdx,
        col("vec_id").isin(probeIds: _*), armK, nprobe, rerankK)
      .select(col("q_id"), col("vec_id").as("id"), col("rank"))
    SimilarityOps.rrfFuse(lex, dense, k0, topK)
      .select(col("q_id"), col("id").as("doc_id"), col("rnk"), col("rrf_score"))
      .orderBy("q_id", "rnk")
  }

  /** Usage: `runMain graft.apps.HybridSearchApp <sfDir> <workDir>` —
    * builds both indexes and smoke-queries the fusion. */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args
    val spark = graft.GraftSession.local("graft-hybrid-search")
    try {
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val corpus = graft.sources.Tables.embeddings(spark, sfDir)
      TextIndexApp.build(spark, docs, s"$workDir/text", nBuckets = 16)
      VectorIndexApp.build(spark, corpus, s"$workDir/vec", kCells = 16, iters = 2)
      val n = query(spark, (0L until 10L).toSeq, docs, corpus,
        s"$workDir/text", s"$workDir/vec",
        topK = 5, armK = 20, k0 = 60, nprobe = 3, rerankK = 20).count()
      println(s"[hybrid-search] fused smoke query rows: $n")
    } finally spark.stop()
  }
}
