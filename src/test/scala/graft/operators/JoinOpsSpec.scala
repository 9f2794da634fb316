package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: whole-version semantics — a null payload column is NOT backfilled from an older version") {
    val facts = Seq((1L, 10L, "f1"), (1L, 4L, "f2"), (2L, 7L, "f3"))
      .toDF("k", "ts", "ev")
    val versions = Seq((1L, 1L, Some("x")), (1L, 5L, None))
      .toDF("vk", "vts", "a")
    val got = JoinOps.asofJoin(facts, versions,
        col("k"), col("vk"), col("ts"), col("vts"), Seq("a"))
      .select("ev", "a").as[(String, Option[String])].collect().toMap
    assert(got("f2") == Some("x")) // ts=4 sees the ts=1 version
    // ts=10 sees the ts=5 version WHOLE: its null column stays null —
    // per-column forward-fill would resurrect "x" from ts=1
    assert(got("f1") == None)
    assert(got("f3") == None) // key with no versions: null-padded
  }

  test("asofJoin: equal timestamps match inclusively (version sorts before fact)") {
    val facts = Seq((1L, 5L, "f")).toDF("k", "ts", "ev")
    val versions = Seq((1L, 5L, "v")).toDF("vk", "vts", "a")
    val got = JoinOps.asofJoin(facts, versions,
        col("k"), col("vk"), col("ts"), col("vts"), Seq("a"))
      .select("a").as[Option[String]].head()
    assert(got == Some("v"))
  }

  test("rangeJoinBanded == naive containment join at every band width") {
    // boundaries on purpose: point == lo (kept), point == hi (dropped),
    // intervals spanning multiple bands, nested/overlapping intervals,
    // an empty interval (dropped), points matching nothing
    val points = Seq(0L, 5L, 10L, 17L, 99L, 100L, 250L)
      .map(p => (p, s"p$p")).toDF("v", "pid")
    val intervals = Seq(
      (0L, 10L, "a"), (5L, 6L, "b"), (10L, 200L, "c"),
      (15L, 15L, "empty"), (90L, 101L, "d"), (240L, 260L, "e"))
      .toDF("lo", "hi", "iid")
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").as[(String, String)].collect().toSet
    assert(naive.nonEmpty && !naive.exists(_._2 == "empty"))
    for (w <- Seq(1L, 5L, 7L, 100L, 1000L)) {
      val banded = JoinOps.rangeJoinBanded(points, col("v"),
          intervals, col("lo"), col("hi"), w)
        .select("pid", "iid").as[(String, String)].collect()
      // exact multiset equality: no duplicates, no misses, at any width
      assert(banded.length == banded.toSet.size, s"width $w produced dups")
      assert(banded.toSet == naive, s"width $w diverged from naive join")
    }
  }
}
