package graft.apps

import java.nio.file.Files

import graft.SparkSpec

class CorpusReleaseAppSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("release: cleaned, decontaminated, deterministically split, partition-pruned") {
    val out = Files.createTempDirectory("release").toString + "/corpus"
    CorpusReleaseApp.release(spark, sfDir, out)
    val released = spark.read.parquet(out)
    val ids = released.select("doc_id").as[Long].collect().toSet
    assert(ids.nonEmpty)

    // nothing contaminated survived
    val contaminated = graft.queries.TextQueries
      .queries("c2_decontaminate")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(contaminated).isEmpty)

    // every released doc passed the clean gate
    val clean = graft.queries.TextQueries
      .queries("c1_clean_corpus")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(clean))

    // split is a partition column (consumers prune, not scan+filter) and
    // covers the corpus; re-running yields the IDENTICAL assignment
    val bySplit = released.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "validation", "test")))
    assert(bySplit.values.sum == ids.size)
    val out2 = Files.createTempDirectory("release2").toString + "/corpus"
    CorpusReleaseApp.release(spark, sfDir, out2)
    val again = spark.read.parquet(out2)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val first = released.select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(again == first)
  }
}
