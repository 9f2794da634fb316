package graft.apps

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Stream == batch for the in-flight decontamination stage: the same
  * corpus streamed in two arbitrary micro-batches must yield exactly the
  * documents the batch c4 pipeline keeps — a document's verdict depends
  * only on itself + the static benchmark, never on batch boundaries. */
class StreamingDecontamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed Bloom decontamination == batch c4 verdict, idempotent ids") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val (h1, h2) = docs.splitAt(docs.length / 2)

    val bm = StreamingDecontamApp.benchmark(spark, sf)
    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("sdecon").toString + "/kept"
    val cp = Files.createTempDirectory("sdecon-cp").toString
    val q = StreamingDecontamApp.run(
      mem.toDF().toDF("doc_id", "text"), bm, out, cp)
    try {
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
    } finally q.stop()

    val kept = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    val contaminated = graft.queries.TextQueries
      .queries("c4_bloom_decontaminate")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val all = docs.map(_._1).toSet
    assert(contaminated.nonEmpty, "fixture must contain contaminated docs")
    assert(kept == all -- contaminated)

    // no document appears twice (the two batches partition the corpus;
    // replay idempotency is carried by the __batch overwrite contract)
    val dups = spark.read.parquet(out)
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dups == 0)
  }
}
