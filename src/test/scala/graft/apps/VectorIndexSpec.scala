package graft.apps

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps
import graft.sources.Tables

/** The persistent IVF index contract: a built index answers queries
  * identically to the in-memory v7 operator with the stored codebook,
  * the codes scan prunes to the probed cells' directories at planning
  * time, and appends against the frozen codebook equal a rebuild. */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val (kCells, iters, topK, nprobe, rerankK) = (8, 2, 5, 2, 10)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("q_id"), col("vec_id"), col("rank"), col("cos_sim"))
      .as[(Long, Long, Int, Double)].collect().toSet

  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] =
    collectPlan(p) { case f: FileSourceScanExec => f }

  test("query == ivfQuantizedAnn with the stored codebook; scan prunes to probed cells") {
    val corpus = Tables.embeddings(spark, sf)
    val idx = Files.createTempDirectory("vidx").toString
    VectorIndexApp.build(spark, corpus, idx, kCells, iters)

    val isProbe = col("vec_id") < 5
    val got = VectorIndexApp.query(spark, corpus, idx, isProbe,
      topK, nprobe, rerankK)
    val cents = spark.read.parquet(s"$idx/centroids")
    val want = SimilarityOps.ivfQuantizedAnn(corpus, cents, isProbe,
      topK, nprobe, rerankK)
    assert(rows(got) == rows(want), "persisted index diverged from v7")

    // IVF's "read only the probed lists", enforced at planning time:
    // the codes scan touches <= probes x nprobe cell directories
    val totalCells = Files.list(Paths.get(s"$idx/codes")).iterator().asScala
      .count(_.getFileName.toString.startsWith("cluster="))
    assert(totalCells > nprobe, s"codebook collapsed to $totalCells cells")
    val codeScans = scansOf(got.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/codes")))
    assert(codeScans.nonEmpty, "no codes scan in the query plan")
    // drop runtime DPP subqueries (unexecutable pre-run) — the STATIC
    // literal cell filter alone must already prune the directories
    val scanned = codeScans.map { f =>
      val static = f.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      f.relation.location.listFiles(static, f.dataFilters).size
    }.sum
    assert(scanned <= 5 * nprobe,
      s"scanned $scanned cell partitions > probes x nprobe")
    assert(scanned < totalCells,
      s"planning-time cell pruning did nothing ($scanned of $totalCells)")

    // the composed serving plan satisfies the mechanical scale
    // invariants (no cartesian, pushed filters, bounded broadcasts …)
    val vs = graft.plans.PlanAudit.violations(got)
    assert(vs.isEmpty, vs.mkString("\n"))
  }

  test("rebuild with pq = None over a PQ-flavored dir drops the stale books") {
    val corpus = Tables.embeddings(spark, sf)
    val idx = Files.createTempDirectory("vidx-downgrade").toString
    VectorIndexApp.build(spark, corpus, idx, kCells, iters,
      pq = Some(VectorIndexApp.PqGeometry(m = 4, subDim = 16, k = 8, iters = 2)))
    // downgrade to the int8 default: the stale frozen books must go,
    // or pqState finds them and silently rebuilds as PQ against the
    // OLD training (and queries serve the flavor nobody asked for)
    VectorIndexApp.build(spark, corpus, idx, kCells, iters, pq = None)
    assert(!Files.exists(Paths.get(s"$idx/pqbook")) &&
      !Files.exists(Paths.get(s"$idx/pqmeta")), "stale PQ books survived")
    val codeCols = spark.read.parquet(s"$idx/codes").columns.toSet
    assert(codeCols.contains("qv") && !codeCols.contains("__c0"),
      s"rebuild wrote PQ codes, not int8: $codeCols")
    val got = VectorIndexApp.query(spark, corpus, idx, col("vec_id") < 5,
      topK, nprobe, rerankK)
    val cents = spark.read.parquet(s"$idx/centroids")
    val want = SimilarityOps.ivfQuantizedAnn(corpus, cents,
      col("vec_id") < 5, topK, nprobe, rerankK)
    assert(rows(got) == rows(want), "downgraded index diverged from v7")
  }

  test("IVFADC flavor: query == ivfPqAnn, cell-pruned scan, append == rebuild") {
    val corpus = Tables.embeddings(spark, sf)
    val g = VectorIndexApp.PqGeometry(m = 4, subDim = 16, k = 8, iters = 2)
    val cut = corpus.stat.approxQuantile("vec_id", Array(0.7), 0.0).head.toLong
    val base = corpus.filter(col("vec_id") <= cut)
    val delta = corpus.filter(col("vec_id") > cut)

    val idx = Files.createTempDirectory("vidx-pq").toString
    VectorIndexApp.build(spark, base, idx, kCells, iters, pq = Some(g))
    val isProbe = col("vec_id") < 5

    // the PQ codes table carries m codes + the norm, never embeddings
    val codeCols = spark.read.parquet(s"$idx/codes").columns.toSet
    assert(codeCols == Set("vec_id", "cluster", "__vnorm") ++
      (0 until g.m).map(s => s"__c$s"), s"unexpected PQ schema: $codeCols")

    // query over the BASE-built index == the in-memory IVFADC search
    // with the stored frozen books
    val cents = spark.read.parquet(s"$idx/centroids")
    val cb = SimilarityOps.pqCodebookFromEntries(
      spark.read.parquet(s"$idx/pqbook"))
    def want(over: org.apache.spark.sql.DataFrame) =
      rows(SimilarityOps.ivfPqSearchCodes(
        SimilarityOps.ivfPqCodes(over, cents, cb, g.m, g.subDim),
        SimilarityOps.ivfPqProbes(corpus, cents, cb, isProbe, nprobe,
          g.m, g.subDim, g.k),
        corpus, isProbe, g.m, g.k, topK, nprobe * 5))
    val got0 = VectorIndexApp.query(spark, corpus, idx, isProbe,
      topK, nprobe, rerankK = nprobe * 5)
    assert(rows(got0) == want(base), "PQ index diverged from in-memory IVFADC")

    // the codes scan still prunes to the probed cells at planning time
    val codeScans = scansOf(got0.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/codes")))
    assert(codeScans.nonEmpty, "no codes scan in the PQ query plan")
    val scanned = codeScans.map { f =>
      val static = f.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      f.relation.location.listFiles(static, f.dataFilters).size
    }.sum
    assert(scanned <= 5 * nprobe,
      s"PQ codes scan read $scanned cell partitions > probes x nprobe")
    assert(graft.plans.PlanAudit.violations(got0).isEmpty)

    // append encodes the delta against the frozen books: the extended
    // index answers exactly like a rebuild-with-frozen-books
    VectorIndexApp.append(spark, delta, idx)
    val got1 = VectorIndexApp.query(spark, corpus, idx, isProbe,
      topK, nprobe, rerankK = nprobe * 5)
    assert(rows(got1) == want(corpus), "PQ append diverged from rebuild")
    assert(rows(got1).exists(_._2 > cut),
      "no delta vector in any result — fixture too small")
  }

  test("append == rebuild with the frozen codebook; replay no-ops") {
    val corpus = Tables.embeddings(spark, sf)
    val cut = corpus.stat.approxQuantile("vec_id", Array(0.7), 0.0).head.toLong
    val base = corpus.filter(col("vec_id") <= cut)
    val delta = corpus.filter(col("vec_id") > cut)
    assert(delta.count() > 0)

    val idx = Files.createTempDirectory("vidx-inc").toString
    VectorIndexApp.build(spark, base, idx, kCells, iters)
    val cents = spark.read.parquet(s"$idx/centroids")
    VectorIndexApp.append(spark, delta, idx)
    assert(!Files.exists(Paths.get(s"$idx/_staging")))

    // the incrementally-extended index answers like a rebuild over the
    // full corpus with the SAME (base-trained, frozen) codebook
    val isProbe = col("vec_id") < 5
    val got = VectorIndexApp.query(spark, corpus, idx, isProbe,
      topK, nprobe, rerankK)
    val want = SimilarityOps.ivfQuantizedAnn(corpus, cents, isProbe,
      topK, nprobe, rerankK)
    assert(rows(got) == rows(want), "appended index diverged from rebuild")
    // and the top-k actually reaches into the appended vectors
    assert(rows(got).exists(_._2 > cut),
      "no delta vector in any result — fixture too small")

    // replaying the applied delta is a no-op (watermark guard)
    def files(): Map[String, Long] =
      Files.walk(Paths.get(idx)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => p.toString -> Files.size(p)).toMap
    val before = files()
    VectorIndexApp.append(spark, delta, idx)
    assert(files() == before, "replay must not write anything")
    // a watermark-STRADDLING delta (one indexed id, one new) refuses —
    // replaying the full corpus would just no-op, so straddle explicitly
    val maxId = corpus.agg(max(col("vec_id"))).head.getLong(0)
    val straddle = corpus.filter(col("vec_id") === maxId)
      .union(corpus.filter(col("vec_id") === maxId)
        .withColumn("vec_id", col("vec_id") + lit(1000L)))
    intercept[IllegalArgumentException] {
      VectorIndexApp.append(spark, straddle, idx)
    }
  }

  test("a corpus wider than the index yields only indexed candidates, scored exactly") {
    val corpus = Tables.embeddings(spark, sf)
    val cut = corpus.stat.approxQuantile("vec_id", Array(0.7), 0.0).head.toLong
    val indexed = corpus.filter(col("vec_id") <= cut)
    val idx = Files.createTempDirectory("vidx-wide").toString
    VectorIndexApp.build(spark, indexed, idx, kCells, iters)
    // probes drawn from the FULL corpus (some of it not yet indexed):
    // candidates must come from the index alone, scores from the corpus
    val got = rows(VectorIndexApp.query(spark, corpus, idx,
      col("vec_id") < 5, topK, nprobe, rerankK))
    assert(got.forall(_._2 <= cut), "an un-indexed vector surfaced as a candidate")
    val cents = spark.read.parquet(s"$idx/centroids")
    val want = rows(SimilarityOps.ivfSearchCodes(
      SimilarityOps.ivfCodes(indexed, cents),
      SimilarityOps.ivfProbes(corpus, cents, col("vec_id") < 5, nprobe),
      corpus, col("vec_id") < 5, topK, rerankK))
    assert(got == want)
  }

  test("streaming ingestion: micro-batch appends == rebuild with the frozen codebook") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Tables.embeddings(spark, sf)
    val cut = corpus.stat.approxQuantile("vec_id", Array(0.6, 0.8), 0.0)
    val (c1, c2) = (cut(0).toLong, cut(1).toLong)
    val base = corpus.filter(col("vec_id") <= c1)

    val idx = Files.createTempDirectory("vidx-str").toString
    VectorIndexApp.build(spark, base, idx, kCells, iters)
    val cents = spark.read.parquet(s"$idx/centroids")

    // new vectors stream in two micro-batches, ids ascending
    val d = corpus.filter(col("vec_id") > c1)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (b1, b2) = d.partition(_._1 <= c2)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = VectorIndexApp.stream(
      mem.toDF().toDF("vec_id", "embedding"), idx,
      Files.createTempDirectory("vidx-cp").toString)
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    } finally q.stop()

    val isProbe = col("vec_id") < 5
    val got = VectorIndexApp.query(spark, corpus, idx, isProbe,
      topK, nprobe, rerankK)
    val want = SimilarityOps.ivfQuantizedAnn(corpus, cents, isProbe,
      topK, nprobe, rerankK)
    assert(rows(got) == rows(want), "streamed index diverged from rebuild")
  }

  test("wide probe sets stay distributed; a 5k-id takedown broadcasts, in one rewrite pass") {
    // a synthetic corpus an order of magnitude past the fixture: 12k
    // vectors — enough that collecting the probe frame to the driver
    // (the old shape) would materialize 12k code rows there, and a 6k
    // takedown would build a 6k-literal In-predicate
    val wide = spark.range(0, 12000).select(col("id").as("vec_id"),
      array((0 until 4).map(i =>
        (pmod(col("id") * (7 * i + 3), lit(997)).cast("float") / lit(997f))
          + lit(0.01f)): _*).cast("array<float>").as("embedding"))
    val idx = Files.createTempDirectory("vidx-wideprobe").toString
    VectorIndexApp.build(spark, wide, idx, kCells = 32, iters = 1)

    // EVERY vector probes (12k probes): the only per-query driver
    // collect is the distinct cell list — bounded by the codebook
    // (<= 32 values), never by the probe count (the broadcast build
    // still holds one transient probe-batch copy; that is the
    // documented serving contract). Structurally: the probe side stays
    // a distributed frame, so no LocalTableScan — the plan signature
    // of a collected-then-parallelized relation — may appear.
    val got = VectorIndexApp.query(spark, wide, idx, col("vec_id") >= 0,
      topK = 3, nprobe = 1, rerankK = 5)
    val locals = collectPlan(got.queryExecution.executedPlan) {
      case l: org.apache.spark.sql.execution.LocalTableScanExec => l
    }
    assert(locals.isEmpty,
      "probe rows were collected to the driver and re-parallelized")
    assert(got.count() > 0)

    // takedown of 6000 ids: above the inline cap, so discovery and the
    // rewrite filter must run as broadcast joins (asserted structurally
    // in SurgicalRewriteSpec), across >= 8 cell files, in ONE rewrite
    // pass — job count bounded by the plan, not the file count
    val targets = (0L until 12000L by 2L).toSeq
    val hitCells = spark.read.parquet(s"$idx/codes")
      .filter(col("vec_id").isin(targets: _*))
      .select(input_file_name()).distinct().count()
    assert(hitCells >= 8, s"takedown spread over only $hitCells files")
    spark.sparkContext.setJobGroup("vidx-big-retract", "5k+ takedown")
    try VectorIndexApp.retract(spark, targets, idx)
    finally spark.sparkContext.clearJobGroup()
    val jobs = stableJobCount("vidx-big-retract")
    // discovery + the broadcast ids frame + one staged rewrite — a
    // handful of jobs bounded by the PLAN (the old per-file loop would
    // run 2+ jobs per hit file, >= 60 here)
    assert(jobs > 0 && jobs <= 10,
      s"retract ran $jobs jobs over $hitCells files")

    val left = spark.read.parquet(s"$idx/codes")
      .select("vec_id").as[Long].collect().toSet
    assert(left == (1L until 12000L by 2L).toSet,
      "retract must drop exactly the even ids")
  }

  test("retract removes vectors from the index, touches only hit cell files") {
    val corpus = Tables.embeddings(spark, sf)
    val idx = Files.createTempDirectory("vidx-ret").toString
    VectorIndexApp.build(spark, corpus, idx, kCells, iters)

    def files(): Map[String, Long] =
      Files.walk(Paths.get(s"$idx/codes")).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => p.toString -> Files.size(p)).toMap
    val before = files()
    val indexed = spark.read.parquet(s"$idx/codes")
      .select("vec_id").as[Long].collect().toSet
    val targets = indexed.toSeq.sorted.take(3)
    val hitFiles = spark.read.parquet(s"$idx/codes")
      .filter(col("vec_id").isin(targets: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
      .map(f => new java.net.URI(f).getPath).toSet

    VectorIndexApp.retract(spark, targets, idx)

    val left = spark.read.parquet(s"$idx/codes")
      .select("vec_id").as[Long].collect().toSet
    assert(left == indexed -- targets, "retract must drop exactly the targets")
    files().foreach { case (f, size) =>
      if (!hitFiles.contains(f))
        assert(before.get(f).contains(size), s"retract touched unrelated $f")
    }
    // retracted vectors no longer appear in any result
    val got = VectorIndexApp.query(spark, corpus, idx,
      col("vec_id") < 5, topK, nprobe, rerankK)
    assert(!rows(got).exists(r => targets.contains(r._2)))
  }

  test("batch (shuffled) probe mode == serving (broadcast) mode, with no probe broadcast") {
    val corpus = Tables.embeddings(spark, sf)
    val idx = Files.createTempDirectory("vidx-batch").toString
    VectorIndexApp.build(spark, corpus, idx, kCells, iters)
    val isProbe = col("vec_id") < 20

    val serving = VectorIndexApp.query(spark, corpus, idx, isProbe,
      topK, nprobe, rerankK)
    val batch = VectorIndexApp.query(spark, corpus, idx, isProbe,
      topK, nprobe, rerankK, broadcastProbes = false)
    assert(rows(batch) == rows(serving),
      "shuffled batch mode diverged from broadcast serving mode")

    // batch mode must not broadcast anything probe-sized: every
    // broadcast left must be the single-row centroid ARRAY (the
    // collect_list aggregate inside cell assignment — it also appears
    // in the DPP subquery Spark adds to prune the codes scan, which
    // collectPlan's subquery descent sees); every probe-carrying join
    // (scoring, survivors, probe vectors, the rerank's corpus join)
    // runs shuffled
    def bcasts(df: org.apache.spark.sql.DataFrame) =
      collectPlan(df.queryExecution.executedPlan) {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
    val batchBs = bcasts(batch)
    assert(batchBs.nonEmpty, "expected the centroid-array broadcast")
    batchBs.foreach(b => assert(
      b.child.simpleString(500).contains("collect_list"),
      s"batch mode broadcast a non-centroid frame:\n${b.treeString}"))
    // reuse wrappers point at the SAME exchange object — count once
    def distinctCount(bs: Seq[org.apache.spark.sql.execution.SparkPlan]) =
      bs.map(System.identityHashCode).distinct.size
    assert(distinctCount(batchBs) < distinctCount(bcasts(serving)),
      "batch mode should broadcast strictly fewer frames than serving")
    // and the audit's mechanical invariants hold for the batch plan too
    val vs = graft.plans.PlanAudit.violations(batch)
    assert(vs.isEmpty, vs.mkString("\n"))
  }

  test("a concurrent append against a held writer lock fails loudly, index untouched") {
    val corpus = Tables.embeddings(spark, sf)
    val cut = corpus.stat.approxQuantile("vec_id", Array(0.7), 0.0).head.toLong
    val idx = Files.createTempDirectory("vidx-lock").toString
    VectorIndexApp.build(spark, corpus.filter(col("vec_id") <= cut),
      idx, kCells, iters)
    def files(): Map[String, Long] =
      Files.walk(Paths.get(idx)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => p.toString -> Files.size(p)).toMap
    val before = files()
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // writer 1 holds the index lock; writer 2's append must fail
    // LOUDLY before staging anything — the enforced single-writer
    // contract (two live appenders used to interleave staging deletes)
    StagedCommit.withWriterLock(fs, new org.apache.hadoop.fs.Path(idx)) {
      val e = intercept[IllegalStateException] {
        VectorIndexApp.append(spark, corpus.filter(col("vec_id") > cut), idx)
      }
      assert(e.getMessage.contains("single-writer"))
    }
    assert(files() == before, "the refused append must not have written anything")
    // with the lock released the same append proceeds
    VectorIndexApp.append(spark, corpus.filter(col("vec_id") > cut), idx)
    assert(spark.read.parquet(s"$idx/codes").count() == corpus.count())
  }

  test("a crashed retraction heals on the next retract (marker-gated walk)") {
    val corpus = Tables.embeddings(spark, sf)
    val idx = Files.createTempDirectory("vidx-crash").toString
    VectorIndexApp.build(spark, corpus, idx, kCells, iters)
    val indexed = spark.read.parquet(s"$idx/codes")
      .select("vec_id").as[Long].collect().toSet
    val targets = indexed.toSeq.sorted.take(3)

    // crash after the first aside rename: one cell file's rows go dark
    // and the rewrite's tmp dir survives as the crash marker
    try {
      SurgicalRewrite.crashAfterAside = 0
      intercept[IllegalStateException] {
        VectorIndexApp.retract(spark, targets, idx)
      }
    } finally SurgicalRewrite.crashAfterAside = Int.MaxValue
    assert(Files.exists(Paths.get(s"$idx/_retract")),
      "crashed rewrite must leave its tmp-dir marker")
    assert(spark.read.parquet(s"$idx/codes")
      .select("vec_id").as[Long].collect().toSet != indexed,
      "expected dark rows after the injected crash")

    // the REPLAYED retract sees the marker, heals the dark file back,
    // re-discovers, and completes — the takedown's crash contract
    VectorIndexApp.retract(spark, targets, idx)
    assert(spark.read.parquet(s"$idx/codes")
      .select("vec_id").as[Long].collect().toSet == indexed -- targets)
    assert(!Files.exists(Paths.get(s"$idx/_retract")))
  }
}
