package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Accuracy + mergeability gates for the HLL-sketch UV path (a14) —
  * the properties the rows-only driver check cannot see. sf0.01 gives
  * ~1500 distinct users/day, enough for the lgK=12 (~2% stderr) sketch
  * to be judged against a ±5% gate. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("a14 approx UV within 5% of exact per day") {
    val approx = CoreQueries.queries("a14_approx_uv")(spark, sf)
      .select("cur_date", "approx_uv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = CoreQueries.queries("a3_daily_uv")(spark, sf)
      .select("cur_date", "uv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (day, uv) =>
      val est = approx(day)
      assert(math.abs(est - uv) <= math.max(1L, (uv * 0.05).toLong),
        s"$day: approx $est vs exact $uv")
    }
  }

  test("per-hour sketches union to the same accuracy as the direct day sketch") {
    // the mergeability property that makes sketches the 100 TB shape:
    // partial sketches built per hour (per partition, per backfill shard)
    // union into the day estimate without recounting raw users
    val hourly = Tables.events(spark, sf)
      .groupBy(date_trunc("DAY", col("ts")).as("day"),
        date_trunc("HOUR", col("ts")).as("hour"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val unioned = hourly.groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .cast("long").as("est"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("cur_date"), col("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = CoreQueries.queries("a3_daily_uv")(spark, sf)
      .select("cur_date", "uv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unioned.keySet == exact.keySet)
    exact.foreach { case (day, uv) =>
      val est = unioned(day)
      assert(math.abs(est - uv) <= math.max(1L, (uv * 0.05).toLong),
        s"$day: unioned $est vs exact $uv")
    }
  }
}
