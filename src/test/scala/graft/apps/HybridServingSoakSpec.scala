package graft.apps

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps
import graft.queries.TextQueries

/** The hybrid tier's COMPOSITION under concurrent maintenance (the r9
  * verdict's task #4): both persistent indexes ingest streaming
  * appends — two writer locks, two snapshot tiers, compaction firing
  * whenever a bucket/cell crosses its file bound — while
  * [[HybridSearchApp.query]] serves between every batch and takedowns
  * interleave on BOTH indexes. At every checkpoint the fused result
  * must equal the RRF of the two FROM-SCRATCH arms over the live
  * corpus — i.e. nothing in the interleaving (append == rebuild,
  * retract == build-without-targets, snapshot-pinned reads) shifts a
  * single fused rank. The single-index soaks ([[StreamingSoakSpec]],
  * [[SnapshotIsolationSpec]]) cover each arm alone; this is the
  * composed surface.
  *
  * Also pinned: a hybrid query PLANNED mid-maintenance (both arms'
  * file lists resolved, then both indexes appended) still executes
  * against its pinned pre-append snapshots — the plan-time isolation
  * contract composed across the two manifest tiers. */
class HybridServingSoakSpec extends SparkSpec {
  import spark.implicits._

  private val (topK, armK, k0, nprobe, rerankK) = (5, 20, 60, 2, 40)
  private val probeIds = (0L until 4L).toSeq

  private def notFast(): Unit =
    assume(sys.env.contains("GRAFT_SOAK"), "soak opt-in: set GRAFT_SOAK=1")

  // deterministic shared-id corpus: overlapping small vocabulary so
  // BM25 is nontrivial; 4-dim embeddings as id-hash rays (the
  // SnapshotIsolationSpec shape)
  private def textOf(id: Long): String = {
    val a = id % 7; val b = (id / 7) % 7; val c = id % 13; val d = id % 5
    s"alpha w$a w$b w$c common w$d w$a tail${id % 3}"
  }
  private def docsOf(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, textOf(i))).toDF("doc_id", "text")
  private def vecsOf(ids: Seq[Long]): DataFrame =
    ids.toDF("vec_id").select(col("vec_id"),
      array((0 until 4).map(i =>
        (pmod(col("vec_id") * (7 * i + 3), lit(997)).cast("float") / lit(997f))
          + lit(0.01f)): _*).cast("array<float>").as("embedding"))

  /** The two from-scratch arms fused — the oracle for every checkpoint. */
  private def fromScratch(live: Seq[Long], vecIdx: String): DataFrame = {
    val docs = docsOf(live)
    val corpus = vecsOf(live)
    val lens = docs.select(col("doc_id"),
      graft.functions.TextFunctions.wordCount(col("text")).as("len"))
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(
          graft.functions.TextFunctions.normalized(col("text")))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val qterms = tf.filter(col("doc_id").isin(probeIds: _*))
      .select(col("doc_id").as("q_id"), col("token"))
    val lexWant = TextQueries.bm25Rank(tf, qterms, df, lens, armK)
      .select(col("q_id"), col("doc_id").as("id"), col("rnk").as("rank"))
    val cents = spark.read.parquet(s"$vecIdx/centroids")
    val denseWant = SimilarityOps.ivfQuantizedAnn(corpus, cents,
        col("vec_id").isin(probeIds: _*), armK, nprobe, rerankK)
      .select(col("q_id"), col("vec_id").as("id"), col("rank"))
    SimilarityOps.rrfFuse(lexWant, denseWant, k0, topK)
      .select(col("q_id"), col("id").as("doc_id"), col("rnk"), col("rrf_score"))
  }

  private def rows(d: DataFrame): Set[(Long, Long, Int, Double)] =
    d.as[(Long, Long, Int, Double)].collect().toSet

  test("hybrid serving stays exact while both indexes append, compact and retract") {
    notFast()
    val work = Files.createTempDirectory("hybrid-soak").toString
    val (textIdx, vecIdx, grp) = (s"$work/text", s"$work/vec", s"$work/_grp")
    var hi = 120L
    var retracted = Set.empty[Long]
    def live: Seq[Long] = (0L until hi).filterNot(retracted)

    TextIndexApp.build(spark, docsOf(0L until hi), textIdx, nBuckets = 16)
    VectorIndexApp.build(spark, vecsOf(0L until hi), vecIdx,
      kCells = 8, iters = 2)
    HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)

    def grouped(ids: Seq[Long]) = HybridSearchApp.query(spark, probeIds,
      docsOf(ids), vecsOf(ids), textIdx, vecIdx,
      topK, armK, k0, nprobe, rerankK, groupDir = Some(grp))
    def checkpoint(where: String): Unit =
      assert(rows(grouped(live)) == rows(fromScratch(live, vecIdx)),
        s"$where: fused serving diverged from the from-scratch fusion")
    checkpoint("after build")

    // plan-time isolation composed across BOTH manifest tiers AND the
    // hybrid group: resolve the fused plan now, run a full maintenance
    // cycle on both indexes, execute the stale plan
    val preLive = live
    val planned = grouped(preLive)
    val wantPre = rows(fromScratch(preLive, vecIdx))
    HybridSearchApp.append(spark, docsOf(hi until hi + 20L),
      vecsOf(hi until hi + 20L), textIdx, vecIdx, grp)
    hi += 20
    assert(rows(planned) == wantPre,
      "a hybrid query planned before the appends must serve the " +
        "pre-append corpus from its pinned snapshots")
    checkpoint("after the planned-reader batch")

    // the soak proper: grouped maintenance cycles (append to both, one
    // group advance), a takedown on both every third batch, a serving
    // query between every batch — PLUS a mid-cycle query every batch:
    // planned after the text arm ingested but before the vector arm
    // did, it must still serve the whole PRE-cycle generation (the
    // cross-index window the hybrid group closes)
    (0 until 9).foreach { i =>
      val preCycle = rows(fromScratch(live, vecIdx))
      TextIndexApp.append(spark, docsOf(hi until hi + 20L), textIdx)
      assert(rows(grouped(live)) == preCycle,
        s"batch $i: a mid-cycle hybrid query must pin the pre-cycle " +
          "generation for BOTH arms")
      VectorIndexApp.append(spark, vecsOf(hi until hi + 20L), vecIdx)
      HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)
      hi += 20
      if (i % 3 == 2) {
        // retract a stripe from the middle of the id space (never a
        // probe), from BOTH indexes — the interleaved-takedown surface
        val victims = (hi - 50 until hi - 45).filterNot(retracted)
          .filterNot(probeIds.contains)
        HybridSearchApp.retractBoth(spark, victims, textIdx, vecIdx, grp)
        retracted ++= victims
      }
      checkpoint(s"after batch $i (hi=$hi, retracted=${retracted.size})")
    }
    assert(retracted.nonEmpty && hi == 320L, "soak shape drifted")
  }

  test("two concurrent maintenance drivers serialize-or-fail-loudly; no torn vector is ever published") {
    notFast()
    val work = Files.createTempDirectory("hybrid-2drv").toString
    val (textIdx, vecIdx, grp) = (s"$work/text", s"$work/vec", s"$work/_grp")
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    var hi = 120L
    TextIndexApp.build(spark, docsOf(0L until hi), textIdx, nBuckets = 16)
    VectorIndexApp.build(spark, vecsOf(0L until hi), vecIdx,
      kCells = 8, iters = 2)
    HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)

    def grouped(ids: Seq[Long]) = HybridSearchApp.query(spark, probeIds,
      docsOf(ids), vecsOf(ids), textIdx, vecIdx,
      topK, armK, k0, nprobe, rerankK, groupDir = Some(grp))

    (0 until 2).foreach { i =>
      val preLive = (0L until hi).toSeq
      val preVec = Snapshots.resolveGroup(fs,
        new org.apache.hadoop.fs.Path(grp)).get
      val preRows = rows(grouped(preLive))
      val aMidPair = new java.util.concurrent.CountDownLatch(1)
      val bDone = new java.util.concurrent.CountDownLatch(1)
      HybridSearchApp.pauseBetweenAppends = () => {
        aMidPair.countDown()
        bDone.await(60, java.util.concurrent.TimeUnit.SECONDS); ()
      }
      val aErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val delta = (hi until hi + 20L).toSeq
      val a = new Thread(() =>
        try HybridSearchApp.append(spark, docsOf(delta), vecsOf(delta),
          textIdx, vecIdx, grp)
        catch { case t: Throwable => aErr.set(t) })
      try {
        a.start()
        assert(aMidPair.await(120, java.util.concurrent.TimeUnit.SECONDS),
          "driver A never reached mid-pair")
        // driver B, while A is PROVABLY mid-pair (text arm ingested,
        // vector arm not): both the full cycle and the bare advance
        // must fail loudly inside A's lease…
        intercept[IllegalStateException] {
          HybridSearchApp.append(spark, docsOf(delta), vecsOf(delta),
            textIdx, vecIdx, grp)
        }
        intercept[IllegalStateException] {
          HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)
        }
        // …and nothing was published: the group still names the
        // pre-cycle vector, and a grouped query still serves exactly
        // the pre-cycle fusion
        assert(Snapshots.resolveGroup(fs,
          new org.apache.hadoop.fs.Path(grp)).get == preVec,
          s"cycle $i: a failed driver-B attempt published a vector")
        assert(rows(grouped(preLive)) == preRows,
          s"cycle $i: mid-pair serving diverged from the pre-cycle fusion")
      } finally {
        bDone.countDown()
        a.join(300000)
        HybridSearchApp.pauseBetweenAppends = () => ()
      }
      assert(aErr.get == null, s"driver A failed: ${aErr.get}")
      hi += 20
      // A's completed cycle published one consistent advance; serving
      // equals the from-scratch fusion over the post-cycle corpus
      assert(rows(grouped((0L until hi).toSeq)) ==
        rows(fromScratch((0L until hi).toSeq, vecIdx)),
        s"cycle $i: post-cycle serving diverged")
    }
  }
}
