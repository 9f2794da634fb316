package graft.apps

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SurgicalRewrite]]'s crash-and-heal contract, and the membership
  * gate's shape switch: a torn aside-swap leaves rows dark but never
  * lost, [[SurgicalRewrite.heal]] + a replayed takedown converge to the
  * clean result, and a takedown above the inline cap runs as a
  * broadcast join instead of a giant In-predicate. */
class SurgicalRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def dataDir(): String = {
    val dir = Files.createTempDirectory("srw").toString
    spark.range(0, 400).select(col("id").as("doc_id"),
        (col("id") * 17).as("payload"))
      .repartition(4, col("doc_id")) // 4 parquet files
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def ids(dir: String): Set[Long] =
    spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet

  private def hitFiles(dir: String, targets: Seq[Long]): Seq[String] =
    spark.read.parquet(dir)
      .filter(col("doc_id").isin(targets: _*))
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSeq

  test("a crash between aside and install leaves rows dark but recoverable; heal + replay completes") {
    val dir = dataDir()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val targets = spark.read.parquet(dir) // one target doc per file
      .groupBy(input_file_name().as("f")).agg(min(col("doc_id")).as("d"))
      .select("d").as[Long].collect().toSeq.sorted
    val hits = hitFiles(dir, targets)
    assert(hits.size == 4)

    // crash after the FIRST aside rename, before its replacement lands:
    // that file's kept rows exist only in the dot-prefixed .bak
    try {
      SurgicalRewrite.crashAfterAside = 0
      intercept[IllegalStateException] {
        SurgicalRewrite.rewrite(spark, hits, s"$dir/_retract",
          df => df.filter(!col("doc_id").isin(targets: _*)),
          Seq(col("doc_id")))
      }
    } finally SurgicalRewrite.crashAfterAside = Int.MaxValue
    val baks = Files.walk(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith(".bak-")).toList
    assert(baks.size == 1, s"expected one aside file, found $baks")
    assert(ids(dir).size < 400, "the torn file's rows should be dark")

    // the CALLER pattern: heal the root, re-discover, re-run — exactly
    // what retract() does on its next invocation
    SurgicalRewrite.heal(fs, new Path(dir))
    assert(ids(dir).size == 400, "heal must restore the dark rows")
    val rehits = hitFiles(dir, targets)
    SurgicalRewrite.rewrite(spark, rehits, s"$dir/_retract",
      df => df.filter(!col("doc_id").isin(targets: _*)),
      Seq(col("doc_id")))
    assert(ids(dir) == (0L until 400L).toSet -- targets)
    assert(Files.walk(Paths.get(dir)).iterator().asScala
      .forall(p => !p.getFileName.toString.startsWith(".bak-")))
  }

  test("an empty re-discovery heals under the stale marker, then retires it") {
    val dir = dataDir()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fabricate the post-crash state a replayed takedown can meet when
    // its targets are already gone: one file dark in its .bak and the
    // crashed run's _retract marker still present
    val f = Files.walk(Paths.get(dir)).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val orig = new Path(f.toString)
    val bak = new Path(orig.getParent, s".bak-${orig.getName}")
    require(fs.rename(orig, bak))
    fs.mkdirs(new Path(s"$dir/_retract/__fid=0"))
    assert(ids(dir).size < 400, "fixture: rows should be dark")

    // empty hit list: rewrite must restore the dark rows BEFORE
    // retiring the marker — deleting the marker first would disarm the
    // callers' marker-gated heal while the .bak rows still exist
    SurgicalRewrite.rewrite(spark, Seq.empty, s"$dir/_retract",
      identity, Seq(col("doc_id")))
    assert(ids(dir).size == 400, "dark rows must be healed back")
    assert(!Files.exists(Paths.get(s"$dir/_retract")),
      "the stale marker must be retired (it re-enables the heal walk)")
  }

  test("heal deletes a leftover .bak whose original landed (post-install crash)") {
    val dir = dataDir()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between install and cleanup: the installed file
    // is in place AND its pre-swap aside still exists
    val f = Files.walk(Paths.get(dir)).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val orig = new Path(f.toString)
    val bak = new Path(orig.getParent, s".bak-${orig.getName}")
    Files.copy(Paths.get(orig.toUri.getPath), Paths.get(bak.toUri.getPath))
    assert(fs.exists(bak))
    SurgicalRewrite.heal(fs, new Path(dir))
    assert(fs.exists(orig) && !fs.exists(bak),
      "a completed swap's leftover aside must be deleted, not restored")
    assert(ids(dir).size == 400)
  }

  test("membership gate: small sets stay a pushed In-filter, large sets become a broadcast join") {
    val dir = dataDir()
    val df = spark.read.parquet(dir)
    val small = (0L until 10L).toSeq
    val large = (0L until (SurgicalRewrite.InlineIdMax + 1L)).toSeq

    val smallPlan = SurgicalRewrite.matching(df, small, "doc_id")
      .queryExecution.optimizedPlan.toString
    assert(!smallPlan.contains("Join"),
      s"small id set should stay a filter, not a join:\n$smallPlan")

    // the small DISCOVERY shape must keep its In-filter PUSHED: the
    // nondeterministic input_file_name projection sits ABOVE the
    // filter (filter-then-project) — projecting first would block
    // Catalyst from pushing the predicate and turn row-group skipping
    // into a full scan. Asserted on the PRODUCTION frame (hitFilesFrame),
    // not a hand-built copy of its shape.
    val disc = SurgicalRewrite.hitFilesFrame(df, small, "doc_id")
    val pushed = collectPlan(disc.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(_.contains("In(")),
      s"small discovery lost filter pushdown: $pushed")

    val largeSemi = SurgicalRewrite.matching(df, large, "doc_id")
      .queryExecution.optimizedPlan.toString
    assert(largeSemi.contains("LeftSemi"),
      s"large id set must run as a semi join:\n$largeSemi")

    val largeAnti = SurgicalRewrite.excluding(df, large, "doc_id")
      .queryExecution.optimizedPlan.toString
    assert(largeAnti.contains("LeftAnti"),
      s"large id set must run as an anti join:\n$largeAnti")

    // semantics identical across the switch
    assert(SurgicalRewrite.matching(df, large, "doc_id")
      .select("doc_id").as[Long].collect().toSet == (0L until 400L).toSet)
    assert(SurgicalRewrite.excluding(df, large.take(5), "doc_id")
      .select("doc_id").as[Long].collect().toSet ==
      (5L until 400L).toSet)
  }
}
