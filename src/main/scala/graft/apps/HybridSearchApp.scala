package graft.apps

import org.apache.hadoop.fs.Path

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
  * space — tiny by the serving contract of both arms.
  *
  * CROSS-INDEX GENERATION (r10 verdict task #1): the two indexes are
  * maintained by separate writers over the same corpus, so two
  * independently-pinned arms could fuse DIFFERENT corpus generations
  * (one arm pre-append, the other post-append — a doc ranked by one
  * arm that the other has never heard of). A hybrid GROUP manifest
  * ([[Snapshots.commitGroup]]) names the three snapshot tables both
  * arms serve from — `postings`, `doclens`, `codes` — as one
  * (table → version) vector; [[append]]/[[retractBoth]] advance it by
  * one atomic rename after BOTH indexes committed, and [[query]] with
  * `groupDir` resolves it once at plan time and pins every member, so
  * a fused query sees one consistent corpus generation across arms.
  *
  * MAINTENANCE CONTRACT: once a hybrid group exists, every mutation of
  * either index must go through [[append]]/[[retractBoth]] (or be
  * followed by [[commitGroup]]). The single-index APIs
  * (`TextIndexApp.append`/`retract`, `VectorIndexApp.append`/
  * `retract`) advance only their OWN pinning; a member that commits
  * more than twice past the hybrid group's last advance pushes the
  * named manifest out of its keep-window, and group-pinned queries
  * then fail LOUDLY (the readTableAt manifest-missing check) until
  * [[commitGroup]] re-advances — a deliberate trade: a silent
  * fall-back to newest heads would quietly reintroduce the torn
  * cross-arm generation this group exists to prevent. */
object HybridSearchApp {

  private def members(textIdx: String, vecIdx: String): Seq[(String, Path)] =
    Seq("postings" -> new Path(s"$textIdx/postings"),
      "doclens" -> new Path(s"$textIdx/doclens"),
      "codes" -> new Path(s"$vecIdx/codes"))

  /** Advance the hybrid group to the current (consistent) heads — call
    * after builds and after any maintenance cycle that mutated both
    * indexes. One atomic rename; idempotent when nothing moved. */
  def commitGroup(spark: SparkSession, textIdx: String, vecIdx: String,
                  groupDir: String): Unit = {
    val fs = new Path(groupDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Snapshots.commitGroup(fs, new Path(groupDir), members(textIdx, vecIdx))
    ()
  }

  /** One hybrid maintenance cycle: append the SAME document batch to
    * both arms, then publish the new corpus generation in one group
    * advance. A crash between the two appends (or before the advance)
    * leaves group-pinned queries on the pre-cycle generation — both
    * arms consistent — and the replayed cycle (idempotent appends)
    * completes and advances. */
  def append(spark: SparkSession, docs: DataFrame, vecs: DataFrame,
             textIdx: String, vecIdx: String, groupDir: String): Unit = {
    TextIndexApp.append(spark, docs, textIdx)
    VectorIndexApp.append(spark, vecs, vecIdx)
    commitGroup(spark, textIdx, vecIdx, groupDir)
  }

  /** Takedown from BOTH arms, then one group advance (same contract
    * as [[append]]; the in-place-rewrite trade of each arm's retract
    * is documented there). */
  def retractBoth(spark: SparkSession, ids: Seq[Long],
                  textIdx: String, vecIdx: String, groupDir: String): Unit = {
    TextIndexApp.retract(spark, ids, textIdx)
    VectorIndexApp.retract(spark, ids, vecIdx)
    commitGroup(spark, textIdx, vecIdx, groupDir)
  }

  def query(spark: SparkSession, probeIds: Seq[Long],
            docs: DataFrame, corpus: DataFrame,
            textIdx: String, vecIdx: String,
            topK: Int, armK: Int, k0: Int,
            nprobe: Int, rerankK: Int,
            groupDir: Option[String] = None): DataFrame = {
    // resolve the hybrid group ONCE, before either arm plans: all
    // three member tables pin to the same generation vector. Without
    // groupDir each arm pins itself (the text index's own group; the
    // vec index's newest codes manifest) — per-arm consistent, but
    // not cross-arm. A caller who PASSED groupDir asked for pinning,
    // so a missing/foreign/degenerate group fails loudly rather than
    // silently degrading to per-arm pins.
    val pins: Option[Map[String, Int]] = groupDir.map { g =>
      val fs = new Path(g).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val p = Snapshots.resolveGroup(fs, new Path(g)).getOrElse(
        throw new IllegalStateException(s"no hybrid group committed at " +
          s"$g — run HybridSearchApp.commitGroup after building both " +
          "indexes"))
      require(Seq("postings", "doclens", "codes")
        .forall(m => p.getOrElse(m, 0) > 0),
        s"hybrid group at $g must name positive versions for " +
          s"postings/doclens/codes (got $p) — was a single-index group " +
          "dir passed, or the group committed before the builds?")
      p
    }
    val lex = TextIndexApp.query(spark,
        docs.filter(col("doc_id").isin(probeIds: _*))
          .select(col("doc_id").as("q_id"), col("text")),
        textIdx, armK,
        pinned = pins.map(p => (p("postings"), p("doclens"))))
      .select(col("q_id"), col("doc_id").as("id"), col("rnk").as("rank"))
    val dense = VectorIndexApp.query(spark, corpus, vecIdx,
        col("vec_id").isin(probeIds: _*), armK, nprobe, rerankK,
        pinnedCodes = pins.map(_("codes")))
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
