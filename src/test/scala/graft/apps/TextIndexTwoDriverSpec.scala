package graft.apps

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two SINGLE-index maintenance drivers on ONE text index (the r12
  * verdict's task #6 — the last unproven concurrent interleave):
  * [[GroupLeaseSpec]] proves bare-advance-vs-member-writer and
  * [[HybridServingSoakSpec]] proves two hybrid drivers under the group
  * lease; here driver A's APPEND is held provably mid-pair (postings
  * committed, doclens not — the torn instant) while driver B attempts
  * its own append and a retract. Both must fail loudly inside A's
  * member writer lock — never interleave — and no reader at any point
  * sees a torn postings/doclens generation. */
class TextIndexTwoDriverSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def textOf(id: Long): String = {
    val a = id % 7; val b = (id / 7) % 7; val c = id % 13; val d = id % 5
    s"alpha w$a w$b w$c common w$d w$a tail${id % 3}"
  }
  private def docsOf(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, textOf(i))).toDF("doc_id", "text")

  private def probesOf(ids: Seq[Long]): DataFrame =
    docsOf(ids).select(col("doc_id").as("q_id"), col("text"))

  private def rows(df: DataFrame): Set[(Long, Long, Int, Double)] =
    df.select(col("q_id"), col("doc_id"), col("rnk"), col("bm25"))
      .as[(Long, Long, Int, Double)].collect().toSet

  test("append vs append/retract: driver B fails loudly inside driver A's lock; no torn generation is ever served") {
    val idx = Files.createTempDirectory("tidx-2drv").toString
    val baseIds = (0L until 120L).toSeq
    val probeIds = (0L until 4L).toSeq
    TextIndexApp.build(spark, docsOf(baseIds), idx, nBuckets = 16)
    val pre = rows(TextIndexApp.query(spark, probesOf(probeIds), idx, 5))

    val aMidPair = new java.util.concurrent.CountDownLatch(1)
    val bDone = new java.util.concurrent.CountDownLatch(1)
    TextIndexApp.pauseBetweenCommits = () => {
      aMidPair.countDown()
      bDone.await(120, java.util.concurrent.TimeUnit.SECONDS); ()
    }
    val aErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val delta = (120L until 140L).toSeq
    val a = new Thread(() =>
      try TextIndexApp.append(spark, docsOf(delta), idx)
      catch { case t: Throwable => aErr.set(t) })
    try {
      a.start()
      assert(aMidPair.await(300, java.util.concurrent.TimeUnit.SECONDS),
        "driver A never reached mid-pair")
      // A is PROVABLY mid-pair: the postings head lists the delta, the
      // doclens head does not — the exact torn instant
      assert(Snapshots.readTable(spark, new Path(s"$idx/postings"))
        .filter(col("doc_id") >= 120L).count() > 0,
        "fixture drifted: postings head lacks the delta")
      assert(Snapshots.readTable(spark, new Path(s"$idx/doclens"))
        .filter(col("doc_id") >= 120L).count() == 0,
        "fixture drifted: doclens head already has the delta")

      // driver B, while A holds the member writer lock: a second
      // append and a retract must both fail loudly — the lock is the
      // only thing between them and interleaved staging deletes
      val e1 = intercept[IllegalStateException] {
        TextIndexApp.append(spark, docsOf(140L until 160L), idx)
      }
      assert(e1.getMessage.contains("another writer holds"),
        s"wrong failure mode: ${e1.getMessage}")
      val e2 = intercept[IllegalStateException] {
        TextIndexApp.retract(spark, Seq(42L, 43L), idx)
      }
      assert(e2.getMessage.contains("another writer holds"),
        s"wrong failure mode: ${e2.getMessage}")

      // a reader at the torn instant (group-pinned) still serves the
      // consistent PRE-append generation, byte-for-byte
      assert(rows(TextIndexApp.query(spark, probesOf(probeIds), idx, 5)) == pre,
        "a mid-pair reader saw a torn postings/doclens generation")
    } finally {
      bDone.countDown()
      a.join(300000)
      TextIndexApp.pauseBetweenCommits = () => ()
    }
    assert(aErr.get == null, s"driver A failed: ${aErr.get}")

    // A's completed append serves exactly the rebuild over the union…
    val fullIds = baseIds ++ delta
    val rebuilt = Files.createTempDirectory("tidx-2drv-full").toString
    TextIndexApp.build(spark, docsOf(fullIds), rebuilt, nBuckets = 16)
    assert(rows(TextIndexApp.query(spark, probesOf(probeIds), idx, 5)) ==
      rows(TextIndexApp.query(spark, probesOf(probeIds), rebuilt, 5)),
      "post-append serving diverged from the rebuild")

    // …and driver B's retract, with the lock free, now succeeds and
    // equals a build that never saw the victims
    val victims = Seq(42L, 43L)
    TextIndexApp.retract(spark, victims, idx)
    val clean = Files.createTempDirectory("tidx-2drv-clean").toString
    TextIndexApp.build(spark,
      docsOf(fullIds.filterNot(victims.contains)), clean, nBuckets = 16)
    assert(rows(TextIndexApp.query(spark, probesOf(probeIds), idx, 5)) ==
      rows(TextIndexApp.query(spark, probesOf(probeIds), clean, 5)),
      "post-retract serving diverged from a build without the targets")
  }
}
