package graft.apps

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The incremental-release contract, asserted byte-for-byte:
  * `append(releaseAll(A), B) == releaseAll(A ∪ B)` — and the append is
  * truly append-only (no pre-existing release file is touched). */
class IncrementalReleaseSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def parquetFiles(dir: String): Map[String, Long] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(p => p.toString -> Files.size(p)).toMap

  private def releaseRows(dir: String): Set[(Long, String, Long, String, Long, Long, Long)] =
    spark.read.parquet(dir)
      .select(col("doc_id"), col("source"), col("epoch"),
        col("split").cast("string"), col("bucket"), col("seq_id"), col("wc"))
      .as[(Long, String, Long, String, Long, Long, Long)]
      .collect().toSet

  test("append(releaseAll(base), delta) == releaseAll(base ∪ delta), append-only") {
    val docs = Tables.documents(spark, sf)
    // split by id: base = lower two thirds, delta = the rest (monotone
    // ingest order — the contract's precondition)
    val cut = docs.stat.approxQuantile("doc_id", Array(2.0 / 3), 0.0).head.toLong
    val base = docs.filter(col("doc_id") <= cut)
    val delta = docs.filter(col("doc_id") > cut)
    assert(delta.count() > 0 && base.count() > 0)

    // the FIXED eval benchmark (base-derived; a real eval set does not
    // grow with the corpus) — same object on both sides of the equality
    val bench = StreamingDecontamApp.benchmarkFrom(
      base, shingleN = 3, benchMod = 37, minOverlap = 3)

    val full = Files.createTempDirectory("rel-full").toString
    val fullIdx = Files.createTempDirectory("rel-full-idx").toString
    IncrementalReleaseApp.releaseAll(spark, docs, bench, full, fullIdx)

    val inc = Files.createTempDirectory("rel-inc").toString
    val incIdx = Files.createTempDirectory("rel-inc-idx").toString
    IncrementalReleaseApp.releaseAll(spark, base, bench, inc, incIdx)
    val before = parquetFiles(inc)
    IncrementalReleaseApp.append(spark, delta, bench, inc, incIdx)
    val after = parquetFiles(inc)

    // append-only: every pre-existing release file survives unchanged
    before.foreach { case (f, size) =>
      assert(after.get(f).contains(size), s"append touched base file $f")
    }
    assert(after.size > before.size, "append wrote no delta files")

    // the released rows are identical to the full rebuild
    val fullRows = releaseRows(full)
    val incRows = releaseRows(inc)
    assert(incRows == fullRows,
      s"full=${fullRows.size} inc=${incRows.size} " +
        s"onlyFull=${(fullRows -- incRows).take(3)} onlyInc=${(incRows -- fullRows).take(3)}")
    // the delta actually contributed rows (non-vacuous equality)
    assert(fullRows.exists(_._1 > cut), "no delta doc survived — fixture too small")
  }

  test("streaming release: micro-batch appends == full rebuild") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, sf)
    val cut = docs.stat.approxQuantile("doc_id", Array(0.5, 0.75), 0.0)
    val (c1, c2) = (cut(0).toLong, cut(1).toLong)
    val base = docs.filter(col("doc_id") <= c1)
    val bench = StreamingDecontamApp.benchmarkFrom(
      base, shingleN = 3, benchMod = 37, minOverlap = 3)

    val full = Files.createTempDirectory("srel-full").toString
    val fullIdx = Files.createTempDirectory("srel-full-idx").toString
    IncrementalReleaseApp.releaseAll(spark, docs, bench, full, fullIdx)

    val out = Files.createTempDirectory("srel").toString
    val idx = Files.createTempDirectory("srel-idx").toString
    IncrementalReleaseApp.releaseAll(spark, base, bench, out, idx)

    // delta streams in two micro-batches, ids ascending across batches
    val d = docs.filter(col("doc_id") > c1)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val (b1, b2) = d.partition(_._1 <= c2)
    val mem = MemoryStream[(Long, String, String)]
    val cp = Files.createTempDirectory("srel-cp").toString
    val q = IncrementalReleaseApp.stream(
      mem.toDF().toDF("doc_id", "text", "source"), bench, out, idx, cp)
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    } finally q.stop()

    assert(releaseRows(out) == releaseRows(full))
  }

  test("retract removes targets, preserves everything else, touches only hit files") {
    val docs = Tables.documents(spark, sf)
    val bench = StreamingDecontamApp.benchmarkFrom(
      docs, shingleN = 3, benchMod = 37, minOverlap = 3)
    val out = Files.createTempDirectory("rel-ret").toString
    val idx = Files.createTempDirectory("rel-ret-idx").toString
    IncrementalReleaseApp.releaseAll(spark, docs, bench, out, idx)

    val before = releaseRows(out)
    val filesBefore = parquetFiles(out)
    // pick 3 released docs, preferring one with multiple epochs
    val multi = before.groupBy(_._1).filter(_._2.size > 1).keys.headOption
    val targets = (multi.toSeq ++ before.map(_._1).toSeq.sorted).distinct.take(3)
    val hitFiles = spark.read.parquet(out)
      .filter(col("doc_id").isin(targets: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
      .map(f => new java.net.URI(f).getPath).toSet
    assert(hitFiles.nonEmpty)

    IncrementalReleaseApp.retract(spark, targets, out, idx)

    val after = releaseRows(out)
    assert(after == before.filterNot(r => targets.contains(r._1)),
      "retract must remove exactly the target rows")
    // only hit files were rewritten; every other file is byte-untouched
    val filesAfter = parquetFiles(out)
    filesBefore.filterNot { case (f, _) => hitFiles.contains(f) }
      .foreach { case (f, size) =>
        assert(filesAfter.get(f).contains(size), s"retract touched unrelated $f")
      }
    // the fp index still knows the retracted docs: a byte-identical
    // future copy must not re-enter (takedown is a verdict)
    val retractedFps = docs.filter(col("doc_id").isin(targets: _*))
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0)).toSet
    val idxFps = spark.read.parquet(s"$idx/fps")
      .as[String].collect().toSet
    assert(retractedFps.subsetOf(idxFps))
  }

  test("append refuses non-monotone deltas") {
    val docs = Tables.documents(spark, sf)
    val bench = StreamingDecontamApp.benchmarkFrom(
      docs, shingleN = 3, benchMod = 37, minOverlap = 3)
    val out = Files.createTempDirectory("rel-mono").toString
    val idx = Files.createTempDirectory("rel-mono-idx").toString
    IncrementalReleaseApp.releaseAll(spark, docs, bench, out, idx)
    intercept[IllegalArgumentException] {
      // replaying the same ids violates the monotone-ingest contract
      IncrementalReleaseApp.append(spark, docs, bench, out, idx)
    }
  }
}
