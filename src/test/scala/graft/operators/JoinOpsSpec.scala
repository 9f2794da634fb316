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
}
