package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.CdcOps

/** R1/R2 for KEYED STATE: a stateful query's state store must survive a
  * stop/restart from the checkpoint — a key deduplicated before the crash
  * stays deduplicated after recovery. (SinksSpec proves source-offset
  * recovery; this proves state recovery.) */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("k", LongType),
    StructField("tag", StringType)))

  test("flatMapGroupsWithState state survives query restart (R1)") {
    val src = Files.createTempDirectory("rsrc").toString
    val out = Files.createTempDirectory("rout").toString + "/t"
    val ckpt = Files.createTempDirectory("rckpt").toString

    def pipeline(): org.apache.spark.sql.streaming.StreamingQuery = {
      val parsed = CdcOps.parseOrDrop(
        spark.readStream.text(src), "value", schema)
        .select(col("j.k").as("k"), col("j.tag").as("tag")).as[(Long, String)]
      val deduped = StatefulOps.keepFirst[Long, (Long, String)](parsed, _._1)
      deduped.toDF("k", "tag").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    Files.writeString(Paths.get(s"$src/f1.json"),
      """{"k": 1, "tag": "first"}
        |{"k": 2, "tag": "first2"}""".stripMargin)
    val q1 = pipeline()
    try q1.processAllAvailable() finally q1.stop()

    // while DOWN: a duplicate of key 1 and a fresh key arrive
    Files.writeString(Paths.get(s"$src/f2.json"),
      """{"k": 1, "tag": "dup-after-restart"}
        |{"k": 3, "tag": "fresh"}""".stripMargin)
    val q2 = pipeline()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out).as[(Long, String)].collect().toMap
    // key 1's marker came back from the checkpointed state store
    assert(got == Map(1L -> "first", 2L -> "first2", 3L -> "fresh"))
  }

  test("multi-sink fan-out: splitBy persists one parsed pass across N sinks (X1)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outA = Files.createTempDirectory("fanA").toString + "/a"
    val outB = Files.createTempDirectory("fanB").toString + "/b"
    val ckpt = Files.createTempDirectory("fanckpt").toString
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("tag", "v").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (handle, branches) = CdcOps.splitBy(batch, "tag", Seq("a", "b"))
        try {
          branches("a").select("v").write.mode("append").parquet(outA)
          branches("b").select("v").write.mode("append").parquet(outB)
        } finally handle.unpersist()
      }
      .start()
    try {
      mem.addData(Seq(("a", 1L), ("b", 2L), ("a", 3L), ("c", 4L)))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(outA).as[Long].collect().sorted.sameElements(Array(1L, 3L)))
    assert(spark.read.parquet(outB).as[Long].collect().sorted.sameElements(Array(2L)))
  }
}
