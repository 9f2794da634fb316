package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.sources.Streams

class SkewStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals the plain aggregation (algebraic merge)") {
    val df = Seq.tabulate(1000)(i => (if (i % 10 == 0) "cold" else "hot", i.toDouble))
      .toDF("k", "v")
    val salted = SkewOps.saltedAgg(df, Seq(col("k")), 8,
      partial = Seq(sum(col("v")).as("__s"), count(lit(1)).as("__c")),
      merge = Seq(sum(col("__s")).as("total"), sum(col("__c")).as("n")))
      .as[(String, Double, Long)].collect().toMap2
    val plain = df.groupBy("k").agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toMap2
    assert(salted == plain)
  }

  implicit class Tupled3[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("saltedJoin rejects every outer-emitting join type, accepts safe aliases") {
    val big = Seq((1L, "a")).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k2", "w")
    // "outer" is Spark's alias for FULL outer — under the old
    // delete-substrings normalization it reduced to "" (same as "left")
    // and slipped through, replicating unmatched small rows saltBuckets
    // times. These must all throw:
    for (bad <- Seq("outer", "full", "fullouter", "full_outer",
                    "right", "rightouter", "right_outer", "cross"))
      intercept[IllegalArgumentException] {
        SkewOps.saltedJoin(big, small, col("k"), col("k2"), 4, bad)
      }
    // and every safe alias must pass the guard and produce the plain join
    for (ok <- Seq("inner", "left", "leftouter", "left_outer",
                   "semi", "leftsemi", "left_semi",
                   "anti", "leftanti", "left_anti")) {
      val n = SkewOps.saltedJoin(big, small, col("k"), col("k2"), 4, ok).count()
      assert(n == (if (ok.contains("anti")) 0L else 1L), s"$ok -> $n")
    }
  }

  test("tokensWithCjk: CJK unigrams + Latin whitespace words") {
    val got = Seq("深度学习 deep learning 模型").toDF("text")
      .select(TextFunctions.tokensWithCjk(col("text"))).as[Seq[String]].head()
    assert(got == Seq("深", "度", "学", "习", "deep", "learning", "模", "型"))
  }

  test("Streams.fileJson: declared-schema JSON stream with rt watermark (S2)") {
    val src = Files.createTempDirectory("sjson").toString
    val schema = StructType(Seq(StructField("user", LongType),
      StructField("ts_sec", LongType)))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$src/a.json"),
      """{"user": 1, "ts_sec": 1700000000}
        |{"user": 2, "ts_sec": 1700000005}
        |garbage line
        |{"user": 3, "ts_sec": 1700000011}""".stripMargin)
    val stream = Streams.fileJson(spark, src, schema, "ts_sec", "2 seconds")
    val q = stream
      .groupBy(window(col("rt"), "10 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("w"), col("n"))
      .writeStream.format("memory").queryName("sjson")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sjson").as[(Long, Long)].collect().toMap
    // garbage dropped; users 1+2 share the first 10 s window, 3 the next
    assert(got == Map(1700000000L -> 2L, 1700000010L -> 1L))
  }
}
