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
  * MAINTENANCE CONTRACT — ENFORCED, not just documented (r11 verdict
  * task #1): every cycle ([[append]], [[retractBoth]]) and every bare
  * [[commitGroup]] runs under the GROUP's single-writer lease
  * ([[StagedCommit.withWriterLock]] on `groupDir`), so two concurrent
  * hybrid maintenance drivers serialize — the second fails LOUDLY
  * inside the first's lease instead of interleaving its advance with
  * the other's half-finished pair. The advance itself additionally
  * samples the three member heads while HOLDING BOTH member indexes'
  * writer locks: a single-index writer (`TextIndexApp.append`/
  * `retract`, `VectorIndexApp.append`/`retract`) active at advance
  * time makes the advance fail loudly rather than read one head
  * before and another after that writer's pair of commits — the
  * sequential-sample race that could silently publish a mixed
  * generation as consistent. LIVENESS under lag (r11 verdict task
  * #2): every advance (and every cycle's entry) also writes GROUP
  * PINS into the members' snapshot dirs, so the generation the group
  * names stays resolvable — manifest kept, data files alive — across
  * ANY number of member commits (heal commits at writer entry,
  * adoption commits, in-cycle compaction), not just the keep-window's
  * arithmetic 2; group-pinned queries keep serving the last published
  * generation instead of failing at the keep-window boundary, and the
  * next advance releases the previous pin. The loud
  * manifest-missing check in readTableAt remains the backstop for a
  * group whose pins were removed (a decommissioned or foreign group)
  * — a silent fall-back to newest heads would quietly reintroduce the
  * torn cross-arm generation this group exists to prevent. */
object HybridSearchApp {

  private def members(textIdx: String, vecIdx: String): Seq[(String, Path)] =
    Seq("postings" -> new Path(s"$textIdx/postings"),
      "doclens" -> new Path(s"$textIdx/doclens"),
      "codes" -> new Path(s"$vecIdx/codes"))

  /** TEST-ONLY: interleave hook between the two arm appends of a
    * cycle — lets a spec hold a driver provably mid-pair while a
    * second driver attempts an advance. Never set outside tests. */
  private[apps] var pauseBetweenAppends: () => Unit = () => ()

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The group's single-writer lease — serializes whole maintenance
    * cycles, so an advance can never run while another driver is
    * mid-pair. */
  private def withGroupLease[T](fs: org.apache.hadoop.fs.FileSystem,
                                groupDir: String)(body: => T): T =
    StagedCommit.withWriterLock(fs, new Path(groupDir))(body)

  /** Sample-and-publish under BOTH member indexes' writer locks (the
    * caller already holds the group lease): with the locks held no
    * index writer can commit between the three head reads, so the
    * published vector is a consistent instant-cut of the member heads
    * — and an ACTIVE single-index writer makes this fail loudly
    * instead. */
  private def advanceLocked(fs: org.apache.hadoop.fs.FileSystem,
                            textIdx: String, vecIdx: String,
                            groupDir: String): Unit =
    StagedCommit.withWriterLock(fs, new Path(textIdx)) {
      StagedCommit.withWriterLock(fs, new Path(vecIdx)) {
        Snapshots.commitGroup(fs, new Path(groupDir),
          members(textIdx, vecIdx))
        ()
      }
    }

  /** Advance the hybrid group to the current (consistent) heads — call
    * after builds and after any maintenance cycle that mutated both
    * indexes. One atomic rename; idempotent when nothing moved. Fails
    * loudly while another hybrid driver's lease or either member
    * index's writer lock is held (see the maintenance contract). */
  def commitGroup(spark: SparkSession, textIdx: String, vecIdx: String,
                  groupDir: String): Unit = {
    val fs = fsOf(spark, groupDir)
    withGroupLease(fs, groupDir) {
      advanceLocked(fs, textIdx, vecIdx, groupDir)
    }
  }

  /** Decommission the hybrid group: remove its pins from all three
    * member tables and delete the group dir — without this a retired
    * group's pins would hold its last-named generation's files
    * forever. Runs under the group lease (a concurrent maintenance
    * driver must not be mid-cycle). The indexes keep serving through
    * their own heads (and the text index's own group). */
  def dropGroup(spark: SparkSession, textIdx: String, vecIdx: String,
                groupDir: String): Unit = {
    val fs = fsOf(spark, groupDir)
    // pins and manifests die under the lease (no advance can race);
    // the dir itself is cleaned up best-effort and NON-recursively
    // after the lease releases — a recursive delete here could destroy
    // a concurrent driver's freshly acquired _writer.lock (and its
    // just-committed manifest) in the gap after our release, silently
    // breaking the serialization the lease exists for. A non-empty
    // dir (someone re-acquired) is simply left alone.
    withGroupLease(fs, groupDir) {
      Snapshots.dropGroup(fs, new Path(groupDir), members(textIdx, vecIdx))
    }
    scala.util.Try(fs.delete(new Path(groupDir), false))
    ()
  }

  /** One hybrid maintenance cycle: append the SAME document batch to
    * both arms, then publish the new corpus generation in one group
    * advance — the whole cycle under the group lease, so a second
    * driver cannot advance against this one's half-finished pair. A
    * crash between the two appends (or before the advance) leaves
    * group-pinned queries on the pre-cycle generation — both arms
    * consistent — and the replayed cycle (idempotent appends)
    * completes and advances.
    *
    * `fullVecCorpus`, when provided, lets the cycle consult the dense
    * arm's [[VectorIndexApp.autoRetrain]] policy. It must be the full
    * indexed corpus AS OF THE END OF THIS CYCLE — including this
    * call's `vecs` delta and excluding every retracted vector;
    * [[VectorIndexApp.retrain]] enforces both (watermark + count
    * identity) loudly. */
  def append(spark: SparkSession, docs: DataFrame, vecs: DataFrame,
             textIdx: String, vecIdx: String, groupDir: String,
             textBucketTargetBytes: Long =
               TextIndexApp.DefaultPostingsBucketBytes,
             fullVecCorpus: Option[DataFrame] = None,
             vecTargetRowsPerCell: Long =
               VectorIndexApp.DefaultRowsPerCell): Unit = {
    val fs = fsOf(spark, groupDir)
    withGroupLease(fs, groupDir) {
      // entry pin-refresh: the cycle's own commits (publish +
      // compaction per member, plus any heal/adoption commits) may
      // exceed the keep-window's lag 2; the pins keep the group-named
      // generation resolvable until the end-advance re-points them
      Snapshots.refreshGroupPins(fs, new Path(groupDir),
        members(textIdx, vecIdx))
      TextIndexApp.append(spark, docs, textIdx)
      pauseBetweenAppends()
      VectorIndexApp.append(spark, vecs, vecIdx)
      advanceLocked(fs, textIdx, vecIdx, groupDir)
      vacuumMembers(fs, textIdx, vecIdx)
      // auto-widen the text arm's term router on the cycle cadence
      // (r13 verdict task #4) — at most one widening per cycle, under
      // this lease. Runs AFTER the advance: the hybrid group pins the
      // pre-rebucket generation, and pinned queries prune with ITS
      // geometry (Snapshots.bucketCountAt) until the next cycle's
      // advance publishes the re-routed one — the exact sequence
      // TextIndexRebucketSpec pins. The vector arm's knob is the
      // autoRetrain consult below (gated on fullVecCorpus): its
      // geometry is trained, so widening it is a re-train.
      TextIndexApp.autoWiden(spark, textIdx, textBucketTargetBytes)
        .foreach(n => System.err.println(
          s"[graft.hybrid] auto-widened $textIdx -> $n buckets"))
      // the dense arm's policy ([[VectorIndexApp.autoRetrain]]) —
      // consulted only when the caller can provide the FULL indexed
      // corpus (a retrain re-encodes every vector; the API keeps that
      // dependency explicit instead of hiding a full-corpus pass
      // behind a maintenance flag). Same publication contract as the
      // text widening above: the re-trained generation is pinned away
      // from group readers until the next cycle's advance.
      fullVecCorpus.foreach { c =>
        VectorIndexApp.autoRetrain(spark, c, vecIdx,
            targetRowsPerCell = vecTargetRowsPerCell)
          .foreach(n => System.err.println(
            s"[graft.hybrid] auto-retrained $vecIdx -> $n cells"))
      }
    }
  }

  /** Snapshot-debris audit on the cycle cadence (r13 verdict task #6):
    * report-only — findings route to [[Snapshots.onVacuumFindings]],
    * deletion stays a manual operator action. */
  private def vacuumMembers(fs: org.apache.hadoop.fs.FileSystem,
                            textIdx: String, vecIdx: String): Unit =
    members(textIdx, vecIdx).foreach { case (_, root) =>
      if (fs.exists(root)) Snapshots.vacuumReport(fs, root); ()
    }

  /** Takedown from BOTH arms, then one group advance (same contract
    * as [[append]]; the in-place-rewrite trade of each arm's retract
    * is documented there). */
  def retractBoth(spark: SparkSession, ids: Seq[Long],
                  textIdx: String, vecIdx: String, groupDir: String): Unit = {
    val fs = fsOf(spark, groupDir)
    withGroupLease(fs, groupDir) {
      Snapshots.refreshGroupPins(fs, new Path(groupDir),
        members(textIdx, vecIdx))
      TextIndexApp.retract(spark, ids, textIdx)
      VectorIndexApp.retract(spark, ids, vecIdx)
      advanceLocked(fs, textIdx, vecIdx, groupDir)
      vacuumMembers(fs, textIdx, vecIdx)
    }
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
