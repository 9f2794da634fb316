package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Semantics of the event-analytics additions (a15 windowed funnel, a16
  * cohort retention) pinned against driver-side reference computations —
  * the fold-order/window-arithmetic details a row-hash oracle alone
  * would not explain if they drifted. */
class FunnelCohortSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val WindowMs = 3L * 86400000L

  test("a15 windowed funnel equals a reference state machine per user") {
    val out = CoreQueries.queries("a15_funnel")(spark, sf).collect()
      .map(r => r.getAs[Int]("stage") -> r.getAs[Long]("n_users")).toMap
    val evs = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
    val stages = evs.groupBy(_.getAs[Long]("user_id")).values.map { rows =>
      // sort at full microsecond precision + unique event_id — the same
      // order array_sort and the oracle's ORDER BY produce
      val sorted = rows.sortBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id")))
      var c = 0
      var t0 = 0L
      sorted.foreach { r =>
        val code = r.getAs[String]("event_type") match {
          case "view" => 1; case "click" => 2; case _ => 3
        }
        val tMs = r.getAs[Long]("us") / 1000L // unix_millis truncation
        if (c == 0 && code == 1) { c = 1; t0 = tMs }
        else if (c == 1 && code == 2 && tMs - t0 <= WindowMs) c = 2
        else if (c == 2 && code == 3 && tMs - t0 <= WindowMs) c = 3
      }
      c
    }.toSeq
    val expected = stages.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out == expected)
    assert(out.values.sum == evs.map(_.getAs[Long]("user_id")).distinct.length)
  }

  test("a17 overlap grid is complete, bounded, and sketch-consistent") {
    val out = CoreQueries.queries("a17_segment_overlap")(spark, sf).collect()
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Long]("user_id")).toSet).toMap
    val types = byType.keys.toSeq.sorted
    // every unordered pair exactly once
    assert(out.length == types.size * (types.size - 1) / 2)
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("seg_a"), r.getAs[String]("seg_b"))
      assert(a < b)
      val expect = (byType(a) intersect byType(b)).size.toLong
      assert(r.getAs[Long]("overlap") == expect, s"($a,$b) overlap")
      // at this cardinality the HLL is in exact mode — the
      // inclusion-exclusion estimate must sit inside the invariant
      assert(r.getAs[Boolean]("within_10pct"), s"($a,$b) sketch drifted")
    }
  }

  test("a16 cohort cells conserve active user-days and full cohorts at offset 0") {
    val out = CoreQueries.queries("a16_cohort_retention")(spark, sf).collect()
    val activeUserDays = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("DAY", col("ts"))).distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum == activeUserDays)
    // offset 0 is every user exactly once (their first active day)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.filter(_.getAs[Int]("day_offset") == 0)
      .map(_.getAs[Long]("n_users")).sum == users)
    assert(out.forall(_.getAs[Int]("day_offset") >= 0))
  }
}
