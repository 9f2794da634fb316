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

  test("a14 sketch estimate within 5% of exact per day (independent of its self-report)") {
    // a14's oracle-visible output is the invariant boolean; this spec
    // recomputes the ESTIMATE itself so a broken sketch path can't hide
    // behind a broken boolean
    val rows = CoreQueries.queries("a14_approx_uv")(spark, sf)
      .select("cur_date", "uv", "within_5pct").collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(2)))
    val exact = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Tables.events(spark, sf)
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .cast("long").as("est"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("cur_date"), col("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (day, uv) =>
      val est = approx(day)
      assert(math.abs(est - uv) <= math.max(1L, (uv * 0.05).toLong),
        s"$day: approx $est vs exact $uv")
    }
  }

  test("HLL sketch works inside a watermarked streaming window agg") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.TsEv
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[TsEv]
    // the sketch buffer lives in the streaming state store per window —
    // bounded ~4 KB state per window regardless of user cardinality
    // (the exact-distinct form keeps every key)
    val out = mem.toDF().withWatermark("ts", "2 seconds")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("key"), lit(12)))
        .cast("long").as("uv"))
      .select(date_format(col("window.start"), "HH:mm:ss").as("stt"), col("uv"))
    val q = out.writeStream.format("memory").queryName("hllwin")
      .outputMode("append").start()
    try {
      mem.addData(Seq(
        TsEv(t("2024-01-01 10:00:01"), "a", 1.0),
        TsEv(t("2024-01-01 10:03:00"), "b", 1.0),
        TsEv(t("2024-01-01 10:04:00"), "a", 1.0),
        TsEv(t("2024-01-01 10:09:00"), "c", 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(TsEv(t("2024-01-01 10:25:00"), "d", 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(TsEv(t("2024-01-01 10:45:00"), "e", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("hllwin").as[(String, Long)].collect().toSet
    // HLL is exact at these cardinalities (sparse mode)
    assert(got == Set(("10:00:00", 3L), ("10:20:00", 1L)))
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
