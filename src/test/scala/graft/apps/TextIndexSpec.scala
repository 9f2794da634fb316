package graft.apps

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TextQueries
import graft.sources.Tables

/** The persistent inverted-index contract: a built index answers BM25
  * queries identically to the from-scratch t15 operator, the postings
  * scan prunes to the probed term buckets at planning time, appends
  * equal a rebuild row-for-row, replays no-op, and retraction equals a
  * fresh build without the targets. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val nBuckets = 16
  private val topK = 5

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("q_id"), col("doc_id"), col("rnk"), col("bm25"))
      .as[(Long, Long, Int, Double)].collect().toSet

  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] =
    collectPlan(p) { case f: FileSourceScanExec => f }

  private def probesOf(docs: org.apache.spark.sql.DataFrame) =
    docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("q_id"), col("text"))

  private def postingsRows(idx: String) =
    spark.read.parquet(s"$idx/postings")
      .select(col("doc_id"), col("token"), col("tf"), col("bucket"))
      .as[(Long, String, Long, Long)].collect().toSet

  test("query == t15 from-scratch result; scan prunes to probed buckets") {
    val docs = Tables.documents(spark, sf)
    val idx = Files.createTempDirectory("tidx").toString
    TextIndexApp.build(spark, docs, idx, nBuckets)

    val got = TextIndexApp.query(spark, probesOf(docs), idx, topK)
    val want = TextQueries.queries("t15_bm25_search")(spark, sf)
    assert(rows(got) == rows(want), "persisted index diverged from t15")

    // batch (shuffled-term) mode == serving (broadcast) mode — the
    // table-sized-probe path must not shift a rank
    val batch = TextIndexApp.query(spark, probesOf(docs), idx, topK,
      broadcastTerms = false)
    assert(rows(batch) == rows(want), "batch term mode diverged")

    // the composed serving plan satisfies the mechanical invariants
    val vs = graft.plans.PlanAudit.violations(got)
    assert(vs.isEmpty, vs.mkString("\n"))

    // term-routed pruning at PLANNING time: a 2-term probe opens at
    // most 2 bucket directories of the 16
    val tiny = Seq((999L, "data join")).toDF("q_id", "text")
    val small = TextIndexApp.query(spark, tiny, idx, topK)
    assert(small.count() > 0, "fixture terms absent from the corpus")
    val totalBuckets = Files.list(Paths.get(s"$idx/postings"))
      .iterator().asScala
      .count(_.getFileName.toString.startsWith("bucket="))
    assert(totalBuckets > 2, s"postings collapsed to $totalBuckets buckets")
    val postScans = scansOf(small.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("/postings")))
    assert(postScans.nonEmpty, "no postings scan in the query plan")
    val scannedDirs = postScans.flatMap(_.relation.location.rootPaths)
      .map(_.toString.replaceAll(".*/postings/", "").takeWhile(_ != '/'))
      .toSet
    assert(scannedDirs.size <= 2,
      s"2-term probe scanned buckets $scannedDirs")
  }

  test("append == rebuild; replay no-ops; straddling delta refused") {
    val docs = Tables.documents(spark, sf)
    val cut = 400L
    val base = docs.filter(col("doc_id") < cut)
    val delta = docs.filter(col("doc_id") >= cut)

    val inc = Files.createTempDirectory("tidx_inc").toString
    TextIndexApp.build(spark, base, inc, nBuckets)
    TextIndexApp.append(spark, delta, inc)
    val full = Files.createTempDirectory("tidx_full").toString
    TextIndexApp.build(spark, docs, full, nBuckets)

    assert(postingsRows(inc) == postingsRows(full),
      "appended postings diverged from rebuild")
    val got = TextIndexApp.query(spark, probesOf(docs), inc, topK)
    assert(rows(got) == rows(TextIndexApp.query(spark, probesOf(docs), full, topK)),
      "incremental index answers differently from rebuild")
    // df/stats are live-computed, so they reflect the append exactly:
    // the from-scratch t15 over the FULL corpus is the ground truth
    assert(rows(got) == rows(TextQueries.queries("t15_bm25_search")(spark, sf)))

    def files(): Map[String, Long] =
      Files.walk(Paths.get(inc)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => p.toString -> Files.size(p)).toMap
    val before = files()
    TextIndexApp.append(spark, delta, inc)
    assert(files() == before, "replay must not write anything")

    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val straddle = docs.filter(col("doc_id") >= maxId - 1) // one old, one... both old
    // build a genuine straddle: one indexed id plus one new id
    val newDoc = Seq((maxId + 1, "brand new appended document text",
      "en", "spec", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val mixed = docs.filter(col("doc_id") === maxId)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(newDoc)
    intercept[IllegalArgumentException] {
      TextIndexApp.append(spark, mixed, inc)
    }
    // the fully-applied frame above (straddle) replays as a no-op
    TextIndexApp.append(spark, straddle.select(
      "doc_id", "text", "lang", "source", "n_chars"), inc)
    assert(files() == before, "fully-applied replay must not write")
  }

  test("retract == fresh build without the targets; rewrite is surgical") {
    val docs = Tables.documents(spark, sf)
    val idx = Files.createTempDirectory("tidx_rt").toString
    TextIndexApp.build(spark, docs, idx, nBuckets)
    // grow file counts so the surgical claim is observable
    val targets = Seq(42L, 43L, 44L)

    def files(): Map[String, Long] =
      Files.walk(Paths.get(s"$idx/postings")).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => p.toString -> Files.size(p)).toMap
    val before = files()
    TextIndexApp.retract(spark, targets, idx)
    val after = files()
    // survivors keep their names; only files that held target rows moved
    val changed = after.keySet.filter(k => before.get(k) != after.get(k)) ++
      (before.keySet -- after.keySet)
    assert(changed.nonEmpty, "retraction rewrote nothing")
    assert((after.keySet -- before.keySet).isEmpty,
      "retraction must not create new file names")

    // no target row survives anywhere
    assert(spark.read.parquet(s"$idx/postings")
      .filter(col("doc_id").isin(targets: _*)).count() == 0)
    assert(spark.read.parquet(s"$idx/doclens")
      .filter(col("doc_id").isin(targets: _*)).count() == 0)

    // query equality with a fresh build that never saw the targets —
    // df and corpus stats adjust exactly because they are never stored
    val clean = Files.createTempDirectory("tidx_clean").toString
    TextIndexApp.build(spark,
      docs.filter(!col("doc_id").isin(targets: _*)), clean, nBuckets)
    val probes = probesOf(docs)
    assert(rows(TextIndexApp.query(spark, probes, idx, topK)) ==
      rows(TextIndexApp.query(spark, probes, clean, topK)),
      "retracted index diverged from a build that never saw the targets")
  }

  test("a published-but-uncommitted file is adopted by the next heal path") {
    // the torn-append window: StagedCommit.publish completed (files
    // visible, watermark advanced) but the crash hit before
    // Snapshots.commit — the file is live yet UNLISTED, and the replay
    // path's early return used to skip the commit that adopts it,
    // leaving serving reads blind to it forever
    val docs = Tables.documents(spark, sf)
    val idx = Files.createTempDirectory("tidx_adopt").toString
    TextIndexApp.build(spark, docs, idx, nBuckets)
    val before = TextIndexApp.postingsFrame(spark, idx).count()

    // simulate the torn state: a valid-content file that is visible in
    // a bucket dir but absent from the snapshot manifest
    val bucketDir = Files.list(Paths.get(s"$idx/postings")).iterator().asScala
      .find(_.getFileName.toString.startsWith("bucket=")).get
    val src = Files.list(bucketDir).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(src, src.resolveSibling("part-torn-append.parquet"))

    // snapshot reads must NOT see the unlisted file (pinned list)...
    assert(TextIndexApp.postingsFrame(spark, idx).count() == before,
      "snapshot read leaked an uncommitted file")
    // ...and the next writer entry (here: an empty heal-only batch)
    // must ADOPT it
    TextIndexApp.append(spark, docs.limit(0), idx)
    assert(TextIndexApp.postingsFrame(spark, idx).count() > before,
      "heal path failed to adopt the published-but-uncommitted file")
  }

  test("streaming ingest: per-batch appends equal the batch rebuild") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val idx = Files.createTempDirectory("tidx_st").toString
    val ckpt = Files.createTempDirectory("tidx_ck").toString
    TextIndexApp.build(spark, docs.filter(col("doc_id") < 300), idx, nBuckets)

    val tail = docs.filter(col("doc_id") >= 300)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = TextIndexApp.stream(mem.toDF().toDF("doc_id", "text"), idx, ckpt)
    try {
      // three micro-batches of monotone doc_id ranges
      tail.grouped((tail.length + 2) / 3).foreach { batch =>
        mem.addData(batch.toSeq)
        q.processAllAvailable()
      }
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    } finally q.stop()

    val full = Files.createTempDirectory("tidx_stfull").toString
    TextIndexApp.build(spark, docs, full, nBuckets)
    assert(postingsRows(idx) == postingsRows(full),
      "streamed index diverged from batch rebuild")
    val probes = probesOf(docs)
    assert(rows(TextIndexApp.query(spark, probes, idx, topK)) ==
      rows(TextIndexApp.query(spark, probes, full, topK)))
  }
}
