package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // (key, ts, payload) with ties on ts to exercise the tie-break
    ("a", 3L, "a3"), ("a", 1L, "a1"), ("a", 1L, "a0"), ("a", 2L, "a2"),
    ("b", 5L, "b5"), ("b", 5L, "b4"),
    ("c", 9L, "c9")
  ).toDF("k", "ts", "p")

  test("keepFirst keeps the minimum under the full order, deterministically") {
    val got = DedupOps.keepFirst(fixture, Seq(col("k")), Seq(col("ts"), col("p")))
      .select("k", "p").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a0", "b" -> "b4", "c" -> "c9"))
  }

  test("keepLast keeps the maximum under the full order") {
    val got = DedupOps.keepLast(fixture, Seq(col("k")), Seq(col("ts"), col("p")))
      .select("k", "p").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a3", "b" -> "b5", "c" -> "c9"))
  }

  test("keepFirst is idempotent") {
    val once = DedupOps.keepFirst(fixture, Seq(col("k")), Seq(col("ts"), col("p")))
    val twice = DedupOps.keepFirst(once, Seq(col("k")), Seq(col("ts"), col("p")))
    assert(once.collect().sortBy(_.toString).sameElements(
      twice.collect().sortBy(_.toString)))
  }

  test("exactly one row per key survives") {
    val got = DedupOps.keepFirst(fixture, Seq(col("k")), Seq(col("ts"), col("p")))
    assert(got.groupBy("k").count().filter(col("count") =!= 1).isEmpty)
  }
}
