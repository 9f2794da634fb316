package graft.apps

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps
import graft.queries.SimilarityQueries
import graft.sources.Tables

/** The incremental-release contract, asserted byte-for-byte:
  * `append(releaseAll(A), B) == releaseAll(A ∪ B)` — the append is
  * truly append-only (no pre-existing release file is touched), reads
  * the bands index pruned to the delta's own buckets, survives crashes
  * at every commit phase via replay, and retraction rewrites all hit
  * files in one job. */
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

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

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

    val full = tmp("rel-full"); val fullIdx = tmp("rel-full-idx")
    IncrementalReleaseApp.releaseAll(spark, docs, bench, full, fullIdx)

    val inc = tmp("rel-inc"); val incIdx = tmp("rel-inc-idx")
    IncrementalReleaseApp.releaseAll(spark, base, bench, inc, incIdx)
    val before = parquetFiles(inc)
    spark.sparkContext.setJobGroup("inc-append", "delta append")
    try IncrementalReleaseApp.append(spark, delta, bench, inc, incIdx)
    finally spark.sparkContext.clearJobGroup()
    val after = parquetFiles(inc)
    // the append's job count is part of its contract: the flood guard
    // rides the bucket-counts aggregation (not a scan of its own), so the
    // whole append is a FIXED number of jobs — a regression that adds a
    // per-append job (an extra count(), a lost cache) fails here
    val jobs = stableJobCount("inc-append")
    info(s"append ran $jobs jobs")
    // measured 82 with the folded guard — the pre-fold shape (its own
    // idxBands aggregation + join) costs one more; a cache regression
    // costs many more. Budget leaves small headroom over the measured
    // value so benign AQE/scheduling variance can't flake the suite
    // while the regression shapes (+1 job or many) still fail
    assert(jobs > 0 && jobs <= 85, s"append ran $jobs jobs — budget is 85")

    // append-only: every pre-existing release file survives unchanged
    before.foreach { case (f, size) =>
      assert(after.get(f).contains(size), s"append touched base file $f")
    }
    assert(after.size > before.size, "append wrote no delta files")
    // the staging area is fully cleaned up after a successful commit
    assert(!Files.exists(Paths.get(s"$incIdx/_staging")))

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

    val full = tmp("srel-full"); val fullIdx = tmp("srel-full-idx")
    IncrementalReleaseApp.releaseAll(spark, docs, bench, full, fullIdx)

    val out = tmp("srel"); val idx = tmp("srel-idx")
    IncrementalReleaseApp.releaseAll(spark, base, bench, out, idx)

    // delta streams in two micro-batches, ids ascending across batches
    val d = docs.filter(col("doc_id") > c1)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val (b1, b2) = d.partition(_._1 <= c2)
    val mem = MemoryStream[(Long, String, String)]
    val cp = tmp("srel-cp")
    val q = IncrementalReleaseApp.stream(
      mem.toDF().toDF("doc_id", "text", "source"), bench, out, idx, cp)
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    } finally q.stop()

    assert(releaseRows(out) == releaseRows(full))
  }

  test("append prunes the bands-index read to delta-touched partitions") {
    val docs = Tables.documents(spark, sf)
    val top = docs.orderBy(col("doc_id").desc).limit(3)
      .select("doc_id").as[Long].collect().min
    val base = docs.filter(col("doc_id") < top)
    val delta = docs.filter(col("doc_id") >= top) // 3 docs — a tiny delta
    val bench = StreamingDecontamApp.benchmarkFrom(
      base, shingleN = 3, benchMod = 37, minOverlap = 3)
    val out = tmp("rel-prune"); val idx = tmp("rel-prune-idx")
    IncrementalReleaseApp.releaseAll(spark, base, bench, out, idx)

    // the index must be spread over many sig-prefix partitions for the
    // pruning claim to be non-vacuous
    val totalDirs = Files.list(Paths.get(s"$idx/bands")).iterator().asScala
      .count(_.getFileName.toString.startsWith("__sp="))
    assert(totalDirs > 32, s"bands index only has $totalDirs partitions")

    // the exact frame append reads, via the same constructors
    val dsets = SimilarityOps.shingleSets(
      delta, col("doc_id"), col("text"), SimilarityQueries.shingleN)
    val dbands = SimilarityOps.lshBands(
      SimilarityOps.minhashSignature(dsets, SimilarityQueries.minhashK),
      SimilarityQueries.minhashK, SimilarityQueries.bandSize)
    val dkeys = dbands.select(col("band"), col("sig")).distinct()
    val touched = dkeys.select(substring(col("sig"), 1, 2)).distinct().count()
    val pruned = IncrementalReleaseApp.deltaTouchedBands(spark, idx, dkeys)

    val bandScans = collectPlan(pruned.queryExecution.executedPlan) {
        case f: FileSourceScanExec => f
      }
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/bands")))
    assert(bandScans.nonEmpty, "no bands scan in the pruned plan")
    val scanned = bandScans.map(f =>
      f.relation.location.listFiles(f.partitionFilters, f.dataFilters).size).sum
    assert(scanned <= touched,
      s"scanned $scanned bands partitions > $touched delta-touched prefixes")
    assert(scanned < totalDirs,
      s"planning-time pruning did nothing ($scanned of $totalDirs)")

    // and the pruned append still lands exactly where a rebuild would
    IncrementalReleaseApp.append(spark, delta, bench, out, idx)
    val full = tmp("rel-prune-full"); val fullIdx = tmp("rel-prune-full-idx")
    IncrementalReleaseApp.releaseAll(spark, docs, bench, full, fullIdx)
    assert(releaseRows(out) == releaseRows(full))
  }

  test("a torn append heals on replay: pre-commit and mid-commit crashes") {
    val docs = Tables.documents(spark, sf)
    val cut = docs.stat.approxQuantile("doc_id", Array(2.0 / 3), 0.0).head.toLong
    val base = docs.filter(col("doc_id") <= cut)
    val delta = docs.filter(col("doc_id") > cut)
    val bench = StreamingDecontamApp.benchmarkFrom(
      base, shingleN = 3, benchMod = 37, minOverlap = 3)
    val full = tmp("crash-full"); val fullIdx = tmp("crash-full-idx")
    IncrementalReleaseApp.releaseAll(spark, docs, bench, full, fullIdx)
    val want = releaseRows(full)

    // crash AFTER staging but BEFORE the commit manifest exists: nothing
    // was published, replay discards the staging and applies cleanly
    val out1 = tmp("crash-pre"); val idx1 = tmp("crash-pre-idx")
    IncrementalReleaseApp.releaseAll(spark, base, bench, out1, idx1)
    val basePublished = releaseRows(out1)
    try {
      StagedCommit.crashBeforeCommit = true
      intercept[IllegalStateException] {
        IncrementalReleaseApp.append(spark, delta, bench, out1, idx1)
      }
    } finally StagedCommit.crashBeforeCommit = false
    // the torn append published NOTHING (staging is invisible to readers)
    assert(releaseRows(out1) == basePublished)
    IncrementalReleaseApp.append(spark, delta, bench, out1, idx1) // replay
    assert(releaseRows(out1) == want)
    assert(!Files.exists(Paths.get(s"$idx1/_staging")))

    // crash MID-commit (after 2 file moves): replay completes the moves
    // from the manifest, meta lands last, and the re-append no-ops
    val out2 = tmp("crash-mid"); val idx2 = tmp("crash-mid-idx")
    IncrementalReleaseApp.releaseAll(spark, base, bench, out2, idx2)
    try {
      StagedCommit.crashAfterMoves = 2
      intercept[IllegalStateException] {
        IncrementalReleaseApp.append(spark, delta, bench, out2, idx2)
      }
    } finally StagedCommit.crashAfterMoves = Int.MaxValue
    IncrementalReleaseApp.append(spark, delta, bench, out2, idx2) // replay
    assert(releaseRows(out2) == want)
    assert(!Files.exists(Paths.get(s"$idx2/_staging")))
    // the healed index's watermark matches the clean run's
    val metaOf = (d: String) => spark.read.parquet(s"$d/meta")
      .agg(max(col("max_doc_id"))).head.getLong(0)
    assert(metaOf(idx2) == metaOf(fullIdx))
  }

  test("retract removes targets, preserves everything else, touches only hit files") {
    val docs = Tables.documents(spark, sf)
    val bench = StreamingDecontamApp.benchmarkFrom(
      docs, shingleN = 3, benchMod = 37, minOverlap = 3)
    val out = tmp("rel-ret"); val idx = tmp("rel-ret-idx")
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
    // no aside/temp debris survives the swap
    assert(Files.walk(Paths.get(out)).iterator().asScala
      .forall(p => !p.getFileName.toString.startsWith(".bak-")))
    assert(!Files.exists(Paths.get(s"$out/_retract")))
    // the fp index still knows the retracted docs: a byte-identical
    // future copy must not re-enter (takedown is a verdict)
    val retractedFps = docs.filter(col("doc_id").isin(targets: _*))
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0)).toSet
    val idxFps = spark.read.parquet(s"$idx/fps")
      .select("fp").as[String].collect().toSet
    assert(retractedFps.subsetOf(idxFps))
  }

  test("retract over many files runs one rewrite pass, not one job per file") {
    val docs = Tables.documents(spark, sf)
    val cuts = docs.stat.approxQuantile(
      "doc_id", Array(0.4, 0.6, 0.8), 0.0).map(_.toLong)
    val bench = StreamingDecontamApp.benchmarkFrom(
      docs.filter(col("doc_id") <= cuts(0)),
      shingleN = 3, benchMod = 37, minOverlap = 3)
    val out = tmp("rel-wide"); val idx = tmp("rel-wide-idx")
    // bootstrap + three appended waves: each wave writes its own files,
    // so the release spreads over many files (the shape a daily-delta
    // release actually has)
    IncrementalReleaseApp.releaseAll(
      spark, docs.filter(col("doc_id") <= cuts(0)), bench, out, idx)
    (cuts :+ Long.MaxValue).sliding(2).foreach { case Array(lo, hi) =>
      IncrementalReleaseApp.append(spark,
        docs.filter(col("doc_id") > lo && col("doc_id") <= hi),
        bench, out, idx)
    }

    val before = releaseRows(out)
    val filesBefore = parquetFiles(out)
    // one target doc per release file → the retraction spreads wide
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f")).agg(min(col("doc_id")).as("d"))
      .select("d").as[Long].collect().distinct.toSeq.sorted
    assert(perFile.size >= 8, s"fixture spread over only ${perFile.size} files")
    val hitFiles = spark.read.parquet(out)
      .filter(col("doc_id").isin(perFile: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
      .map(f => new java.net.URI(f).getPath).toSet

    spark.sparkContext.setJobGroup("retract-wide", "batched retraction")
    try IncrementalReleaseApp.retract(spark, perFile, out, idx)
    finally spark.sparkContext.clearJobGroup()
    val jobs = stableJobCount("retract-wide")
    // discovery + broadcast + one staged write ≈ a handful of jobs —
    // bounded by the PLAN, not the file count (the old per-file loop ran
    // 2+ jobs per hit file, ≥ 16 here)
    assert(jobs > 0 && jobs <= 8, s"retract ran $jobs jobs over ${hitFiles.size} files")

    val after = releaseRows(out)
    assert(after == before.filterNot(r => perFile.contains(r._1)))
    filesBefore.filterNot { case (f, _) => hitFiles.contains(f) }
      .foreach { case (f, size) =>
        assert(parquetFiles(out).get(f).contains(size), s"touched unrelated $f")
      }
  }

  test("append replay no-ops; a genuinely overlapping delta refuses") {
    val docs = Tables.documents(spark, sf)
    val bench = StreamingDecontamApp.benchmarkFrom(
      docs, shingleN = 3, benchMod = 37, minOverlap = 3)
    val out = tmp("rel-mono"); val idx = tmp("rel-mono-idx")
    IncrementalReleaseApp.releaseAll(spark, docs, bench, out, idx)
    val files = parquetFiles(out)
    // replaying a fully-released delta is the micro-batch replay shape:
    // idempotent no-op, nothing written
    IncrementalReleaseApp.append(spark, docs, bench, out, idx)
    assert(parquetFiles(out) == files, "replay must not write anything")
    // a delta that STRADDLES the watermark (some ids released, some new)
    // is a genuine ingest-order violation: refuse loudly
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val straddle = docs.filter(col("doc_id") === maxId)
      .union(docs.filter(col("doc_id") === maxId)
        .withColumn("doc_id", col("doc_id") + lit(1000L)))
    intercept[IllegalArgumentException] {
      IncrementalReleaseApp.append(spark, straddle, bench, out, idx)
    }
  }

  test("takedown is a verdict: copies AND near-dups of retracted content stay out") {
    val docs = Tables.documents(spark, sf)
    val bench = StreamingDecontamApp.benchmarkFrom(
      docs, shingleN = 3, benchMod = 37, minOverlap = 3)
    val out = tmp("rel-verdict"); val idx = tmp("rel-verdict-idx")
    IncrementalReleaseApp.releaseAll(spark, docs, bench, out, idx)

    // take down a released doc, then try to sneak its content back in
    val target = releaseRows(out).map(_._1).min
    val targetText = docs.filter(col("doc_id") === target)
      .select("text").as[String].head()
    IncrementalReleaseApp.retract(spark, Seq(target), out, idx)

    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val delta = Seq(
      (maxId + 1, targetText, "crawl"),            // byte-identical copy
      (maxId + 2, targetText + " postscript", "crawl") // near-duplicate
    ).toDF("doc_id", "text", "source")
    IncrementalReleaseApp.append(spark, delta, bench, out, idx)

    val ids = releaseRows(out).map(_._1)
    assert(!ids.contains(maxId + 1),
      "a byte-identical copy of taken-down content re-entered (fp gate)")
    assert(!ids.contains(maxId + 2),
      "a near-duplicate of taken-down content re-entered (band/shingle gate)")
    assert(!ids.contains(target))
  }

  test("lifecycle soak: bootstrap → streamed appends → retract == rebuild minus holes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, sf)
    val cut = docs.stat.approxQuantile("doc_id", Array(0.5, 0.75), 0.0)
    val (c1, c2) = (cut(0).toLong, cut(1).toLong)
    val base = docs.filter(col("doc_id") <= c1)
    val bench = StreamingDecontamApp.benchmarkFrom(
      base, shingleN = 3, benchMod = 37, minOverlap = 3)

    val full = tmp("soak-full"); val fullIdx = tmp("soak-full-idx")
    IncrementalReleaseApp.releaseAll(spark, docs, bench, full, fullIdx)

    val out = tmp("soak"); val idx = tmp("soak-idx")
    IncrementalReleaseApp.releaseAll(spark, base, bench, out, idx)
    val d = docs.filter(col("doc_id") > c1)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val (b1, b2) = d.partition(_._1 <= c2)
    val mem = MemoryStream[(Long, String, String)]
    val q = IncrementalReleaseApp.stream(
      mem.toDF().toDF("doc_id", "text", "source"), bench, out, idx, tmp("soak-cp"))
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    } finally q.stop()

    // interleave a takedown touching both the base and a streamed delta
    val released = releaseRows(out).map(_._1)
    val targets = Seq(released.filter(_ <= c1).min, released.filter(_ > c1).max)
    IncrementalReleaseApp.retract(spark, targets, out, idx)

    val want = releaseRows(full).filterNot(r => targets.contains(r._1))
    assert(releaseRows(out) == want)
  }
}
