package graft.apps

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps

/** The bounded-compaction contract under a long append soak — the
  * time-axis scale property a one-shot bench cannot see: without
  * compaction the index grows one file per touched partition dir per
  * append FOREVER (a year of 10 s micro-batches is ~3M files per hot
  * cell dir), so the soak drives 50 appends and asserts every
  * directory's READABLE file set (the [[Snapshots]] data list serving
  * queries plan against) stays at ≤ threshold files AT REST — with raw
  * disk bounded at data + one cycle's retired-pending files (the
  * deferred-delete grace [[SnapshotIsolationSpec]] pins) — that
  * compaction is a pure file merge (query results identical
  * before/after, in-file vec_id order preserved, untouched dirs
  * byte-identical), and that a crash INSIDE the compaction commit is
  * INVISIBLE to snapshot readers (old manifest + originals — stronger
  * than the raw layout's rows-dark-never-duplicated) and heals on the
  * next append with no row lost or duplicated. */
class CompactionSoakSpec extends SparkSpec {
  import spark.implicits._

  private val (kCells, topK, nprobe, rerankK) = (4, 3, 2, 5)

  /** Deterministic dim-4 vectors, ids [lo, hi). */
  private def vecs(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("vec_id"),
      array((0 until 4).map(i =>
        (pmod(col("id") * (7 * i + 3), lit(997)).cast("float") / lit(997f))
          + lit(0.01f)): _*).cast("array<float>").as("embedding"))

  /** RAW visible parquet files per partition directory of the index:
    * `codes/cluster=N` dirs plus the unpartitioned `meta` dir. Codes
    * dirs may hold retired-pending files on top of the readable set —
    * [[snapFiles]] is the readable view; this is the DISK view. */
  private def dirFiles(idx: String): Map[String, Seq[String]] = {
    val cellDirs = Files.list(Paths.get(s"$idx/codes")).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("cluster=")).toSeq
    (cellDirs :+ Paths.get(s"$idx/meta")).map { d =>
      d.toString -> Files.list(d).iterator().asScala
        .map(_.getFileName.toString)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
        .toSeq.sorted
    }.toMap
  }

  /** READABLE files per codes cell directory — the current snapshot's
    * data list, which is what every serving query plans against. */
  private def snapFiles(idx: String): Map[String, Seq[String]] = {
    val root = new org.apache.hadoop.fs.Path(s"$idx/codes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshots.currentFiles(fs, root).getOrElse(fail("codes not snapshot-managed"))
      .groupBy(p => s"$idx/codes/${p.takeWhile(_ != '/')}")
      .map { case (d, ps) => d -> ps.map(_.dropWhile(_ != '/').drop(1)).sorted }
  }

  private def indexedIds(idx: String): Seq[Long] =
    VectorIndexApp.codesFrame(spark, idx).select("vec_id").as[Long].collect().toSeq

  private def queryRows(idx: String, corpus: DataFrame) =
    VectorIndexApp.query(spark, corpus, idx, col("vec_id") < 5,
      topK, nprobe, rerankK)
      .select(col("q_id"), col("vec_id"), col("rank"), col("cos_sim"))
      .as[(Long, Long, Int, Double)].collect().toSet

  test("50-append soak: dirs bounded, merges pure, crash at the compaction commit heals") {
    assume(sys.env.contains("GRAFT_SOAK"), "soak opt-in: set GRAFT_SOAK=1")
    val Threshold = 4
    val Delta = 10L
    val Base = 200L
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val saved = Compaction.DefaultMaxFiles
    Compaction.DefaultMaxFiles = Threshold
    try {
      val idx = Files.createTempDirectory("cmp-soak").toString
      VectorIndexApp.build(spark, vecs(0, Base), idx, kCells, iters = 1)
      val cents = spark.read.parquet(s"$idx/centroids")
      var hi = Base
      def append(n: Long): Unit = {
        VectorIndexApp.append(spark, vecs(hi, hi + n), idx); hi += n
      }

      // ---- phase 1: 30 plain appends, every dir bounded AT REST ----
      // READABLE files (the snapshot data list) ≤ threshold; RAW disk
      // ≤ readable + one cycle's retired-pending (deferred deletes)
      val RawBound = 2 * (Threshold + 1)
      var appends = 0
      (1 to 30).foreach { i =>
        append(Delta); appends += 1
        val over = snapFiles(idx).filter(_._2.length > Threshold)
        assert(over.isEmpty,
          s"after append $i these dirs exceed $Threshold readable files: " +
            over.map { case (d, f) => s"$d=${f.length}" }.mkString(", "))
        val raw = dirFiles(idx).filter(_._2.length > RawBound)
        assert(raw.isEmpty,
          s"after append $i raw disk exceeds the deferred-delete bound: " +
            raw.map { case (d, f) => s"$d=${f.length}" }.mkString(", "))
        // meta is raw Del+Move (no snapshot) — bounded as before
        assert(dirFiles(idx)(s"$idx/meta").length <= Threshold)
      }
      // non-vacuous: 30 appends with threshold 4 means compaction must
      // actually have fired — without it the hot cell dirs would hold
      // ~31 files each
      assert(snapFiles(idx).values.map(_.length).max <= Threshold)
      // the MANIFEST scale bound (r10 task #3): a manifest line is one
      // readable or grace-window file, so the at-rest compaction bound
      // caps manifest size structurally — data lines ≤ dirs × threshold
      // and total lines ≤ data + two grace generations of retirees.
      // (The measured cost of the ceiling is in PLANS.md: commit is
      // ~15 µs/line, resolve sub-second up to 10⁶ lines.)
      val manifestDir = new org.apache.hadoop.fs.Path(s"$idx/codes/_snap")
      val newest = fs.listStatus(manifestDir).map(_.getPath)
        .filter(_.getName.startsWith("v")).maxBy(_.getName)
      val lines = {
        val in = fs.open(newest)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
      val dataLines = lines.count(_.startsWith("data "))
      val nDirs = snapFiles(idx).size
      assert(dataLines <= nDirs * Threshold,
        s"manifest data lines ($dataLines) exceed the structural bound " +
          s"($nDirs dirs x $Threshold)")
      assert(lines.length <= 3 * nDirs * Threshold + 1,
        s"manifest total lines (${lines.length}) exceed data + two grace " +
          "generations")

      // ---- phase 2: compaction is a PURE merge --------------------
      // grow past the threshold with compaction disabled, then compact
      // directly and compare everything observable
      Compaction.DefaultMaxFiles = 1000
      (1 to 6).foreach { _ => append(Delta); appends += 1 }
      Compaction.DefaultMaxFiles = Threshold
      val before = dirFiles(idx)
      val snapBefore = snapFiles(idx)
      // with compaction disabled for the growth appends, every pending
      // retirement was flushed — raw codes disk == the readable set
      snapBefore.foreach { case (d, f) =>
        assert(before(d) == f, s"raw/readable diverged pre-compaction at $d")
      }
      assert(snapBefore.values.exists(_.length > Threshold),
        "fixture failed to grow any dir past the threshold")
      val wantRows = queryRows(idx, vecs(0, hi))
      val wantIds = indexedIds(idx)
      assert(wantIds.length == wantIds.distinct.length)

      VectorIndexApp.compactIndex(spark, fs, idx)

      val after = dirFiles(idx)
      val snapAfter = snapFiles(idx)
      assert(snapAfter.values.forall(_.length <= Threshold))
      // over-threshold dirs merged down to ONE readable file (their
      // originals stay on disk, RETIRED, until the next commit — the
      // grace window); untouched dirs keep their exact file set
      // byte-identically (appends never rewrite: same name = same
      // bytes), on disk AND in the snapshot
      snapBefore.foreach { case (d, fsBefore) =>
        if (fsBefore.length > Threshold) {
          assert(snapAfter(d).length == 1,
            s"$d merged to ${snapAfter(d).length} readable files")
          assert(after(d).toSet == (fsBefore ++ snapAfter(d)).toSet,
            s"grace window violated at $d: retired files deleted early")
        } else {
          assert(snapAfter(d) == fsBefore, s"compaction touched bounded dir $d")
          assert(after(d) == fsBefore, s"compaction touched bounded dir $d on disk")
        }
      }
      // row multiset and query results identical — a pure file merge
      assert(indexedIds(idx).sorted == wantIds.sorted,
        "compaction changed the row multiset")
      assert(queryRows(idx, vecs(0, hi)) == wantRows,
        "compaction changed query results")
      // the merged file preserves the in-file vec_id order that makes
      // parquet row-group min/max stats skip for pushed vec_id filters
      val mergedDir = snapBefore.collect {
        case (d, f) if f.length > Threshold && d.contains("cluster=") => d
      }.head
      val mergedIds = spark.read
        .parquet(s"$mergedDir/${snapAfter(mergedDir).head}")
        .select("vec_id").as[Long].collect().toSeq
      assert(mergedIds == mergedIds.sorted,
        "merged file lost the vec_id clustering")

      // ---- phase 2b: size-tier graduation, PER-TABLE ---------------
      // a file at/above the target size is NEVER rewritten again —
      // without the tier every cycle rewrites the dir's full contents
      // (merged file included): O(total²/maxFiles) write amplification.
      // The graduation size rides the CODES TABLE'S OWN MANIFEST (r11
      // task #5): the global default is never touched, so one table
      // can graduate at its own size while every other table keeps the
      // default — the structural manifest bound (lines ≈
      // bytes/targetBytes) is a per-table parameter, not a global.
      val mergedName = snapAfter(mergedDir).head
      val mergedSize = Files.size(Paths.get(s"$mergedDir/$mergedName"))
      val globalTarget = Compaction.DefaultTargetBytes
      graft.sinks.Sinks.setCompactionTarget(spark, s"$idx/codes", mergedSize)
      try {
        Compaction.DefaultMaxFiles = 1000
        (1 to 6).foreach { _ => append(Delta); appends += 1 }
        Compaction.DefaultMaxFiles = Threshold
        val preIds = indexedIds(idx)
        VectorIndexApp.compactIndex(spark, fs, idx)
        // the graduated file survives BY NAME (same bytes — appends and
        // compaction never rewrite in place), the small files merged
        val nowFiles = snapFiles(idx)(mergedDir)
        assert(nowFiles.contains(mergedName),
          "compaction rewrote a graduated file")
        assert(Files.size(Paths.get(s"$mergedDir/$mergedName")) == mergedSize)
        assert(nowFiles.length <= Threshold + 1, // ≤ threshold small + graduated
          s"graduating dir holds ${nowFiles.length} readable files")
        assert(indexedIds(idx).sorted == preIds.sorted,
          "graduated compaction changed the row multiset")
        assert(Compaction.DefaultTargetBytes == globalTarget,
          "the per-table tier must not touch the global default")
      } finally
        // restore: one commit re-points the table at the default tier
        // (everything small again) — the next compaction folds the
        // graduated file back in, soak invariants unchanged
        graft.sinks.Sinks.setCompactionTarget(spark, s"$idx/codes",
          globalTarget)

      // ---- phase 3: crash INSIDE the compaction commit ------------
      Compaction.DefaultMaxFiles = 1000
      (1 to 6).foreach { _ => append(Delta); appends += 1 }
      Compaction.DefaultMaxFiles = Threshold
      val preCrash = indexedIds(idx)
      // crash after the 2nd committed op — mid-install, the window
      // where some merged files are in the directories but the
      // snapshot still lists the originals
      try {
        StagedCommit.crashAfterMoves = 2
        intercept[IllegalStateException] {
          VectorIndexApp.compactIndex(spark, fs, idx)
        }
      } finally StagedCommit.crashAfterMoves = Int.MaxValue
      assert(Files.exists(Paths.get(s"$idx/_staging/COMMIT")),
        "torn compaction must leave its frozen manifest")
      // snapshot readers cannot observe the crash AT ALL: the manifest
      // still lists exactly the pre-crash files (raw readers would see
      // duplicated rows here — the snapshot view is strictly stronger
      // than the old raw layout's rows-dark-never-duplicated)
      val crashIds = indexedIds(idx)
      assert(crashIds.sorted == preCrash.sorted,
        "crash window changed the snapshot-read row multiset")

      // the NEXT append heals the torn compaction before reading, then
      // applies and re-compacts — the inherited crash contract
      append(Delta); appends += 1
      assert(!Files.exists(Paths.get(s"$idx/_staging")))
      assert(indexedIds(idx).sorted == (preCrash ++ (hi - Delta until hi)).sorted,
        "heal + append lost or duplicated rows")
      assert(snapFiles(idx).values.forall(_.length <= Threshold))

      // ---- phase 3b: a DIRECT compact over a torn manifest heals it,
      // never destroys it — the staged merged files are the only copy
      // of rows whose originals the Del phase already removed, so a
      // blind staging delete here would be permanent data loss
      Compaction.DefaultMaxFiles = 1000
      (1 to 6).foreach { _ => append(Delta); appends += 1 }
      Compaction.DefaultMaxFiles = Threshold
      val preCrash2 = indexedIds(idx)
      try {
        StagedCommit.crashAfterMoves = 2
        intercept[IllegalStateException] {
          VectorIndexApp.compactIndex(spark, fs, idx)
        }
      } finally StagedCommit.crashAfterMoves = Int.MaxValue
      assert(Files.exists(Paths.get(s"$idx/_staging/COMMIT")))
      VectorIndexApp.compactIndex(spark, fs, idx) // heal-first, then merge
      assert(!Files.exists(Paths.get(s"$idx/_staging")))
      assert(indexedIds(idx).sorted == preCrash2.sorted,
        "direct compact over a torn manifest lost rows")
      assert(snapFiles(idx).values.forall(_.length <= Threshold))

      // ---- phase 4: top up past 50 appends, final content gate ----
      (appends until 50).foreach { _ => append(Delta); appends += 1 }
      assert(appends >= 50 && hi == Base + appends * Delta,
        s"soak ran $appends appends, hi=$hi")
      val files = snapFiles(idx)
      assert(files.values.forall(_.length <= Threshold),
        s"end of soak: ${files.filter(_._2.length > Threshold)}")
      val raw = dirFiles(idx)
      assert(raw.filter(_._1.contains("cluster="))
          .values.forall(_.length <= RawBound),
        s"end of soak, raw disk: ${raw.filter(_._2.length > RawBound)}")
      assert(raw(s"$idx/meta").length <= Threshold)
      info(s"50 appends: ${files.size} dirs, " +
        s"max ${files.values.map(_.length).max} readable files/dir " +
        s"(threshold $Threshold; raw max " +
        s"${raw.filter(_._1.contains("cluster=")).values.map(_.length).max})")
      // the soaked-and-compacted index answers exactly like the
      // in-memory operator over the full corpus with the frozen codebook
      val want = SimilarityOps.ivfQuantizedAnn(vecs(0, hi), cents,
        col("vec_id") < 5, topK, nprobe, rerankK)
        .select(col("q_id"), col("vec_id"), col("rank"), col("cos_sim"))
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(queryRows(idx, vecs(0, hi)) == want,
        "soaked index diverged from the in-memory operator")
    } finally Compaction.DefaultMaxFiles = saved
  }
}
