package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  test("parseOrDrop drops malformed JSON, keeps valid rows") {
    val df = Seq(
      (1, """{"id": "7", "name": "x"}"""),
      (2, """not json"""),
      (3, """{"id": "8"}""")
    ).toDF("row", "payload")
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("name", StringType)))
    val got = CdcOps.parseOrDrop(df, "payload", schema)
      .select("row").as[Int].collect().sorted
    assert(got.sameElements(Array(1, 3)))
  }

  test("mapProjection extracts map fields by name") {
    val df = Seq(Map("id" -> "1", "sku" -> "s9", "noise" -> "z")).toDF("data")
    val got = df.select(CdcOps.mapProjection(col("data"), Seq("id", "sku")): _*)
    assert(got.columns.toSeq == Seq("id", "sku"))
    assert(got.as[(String, String)].head() == ("1", "s9"))
  }

  test("conditionalDelta: insert = value, update = new - old") {
    val df = Seq(("insert", 10, 0), ("update", 10, 4)).toDF("op", "nv", "ov")
    val got = df.select(
      CdcOps.conditionalDelta(col("op"), col("nv"), col("ov")).as("d"))
      .as[Int].collect().toSeq
    assert(got == Seq(10, 6))
  }

  test("filterColumns keeps only whitelisted map keys") {
    val df = Seq(Map("a" -> "1", "b" -> "2", "c" -> "3")).toDF("data")
    val got = df.select(CdcOps.filterColumns(col("data"), Seq("a", "c")).as("m"))
      .as[Map[String, String]].head()
    assert(got == Map("a" -> "1", "c" -> "3"))
  }

  test("splitBy partitions rows by tag and persists the parsed input") {
    val df = Seq(("x", 1), ("y", 2), ("x", 3), ("z", 4)).toDF("tag", "v")
    val (handle, branches) = CdcOps.splitBy(df, "tag", Seq("x", "y"))
    try {
      assert(branches("x").count() == 2)
      assert(branches("y").count() == 1)
      assert(handle.storageLevel.useMemory || handle.storageLevel.useDisk)
    } finally handle.unpersist()
  }
}
