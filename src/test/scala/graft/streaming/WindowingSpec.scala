package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.WindowOps

case class TsEv(ts: Timestamp, key: String, v: Double)
case class Oe(ts: Timestamp, event_id: Long, event_type: String, value: Double)

class WindowingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling agg == batch agg for on-time data; late rows dropped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[TsEv]
    val out = Windows.tumblingAgg(mem.toDF(), "ts", "10 minutes", "2 seconds",
      Seq(col("key")), Seq(count(lit(1)).as("pv"), sum(col("v")).as("amount")))
    val q = out.writeStream.format("memory").queryName("win")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: fills window [10:00, 10:10) — not yet emitted (append mode)
      mem.addData(Seq(
        TsEv(t("2024-01-01 10:00:01"), "a", 1.0),
        TsEv(t("2024-01-01 10:03:00"), "a", 2.0),
        TsEv(t("2024-01-01 10:09:59"), "b", 4.0)))
      q.processAllAvailable()
      // batch 2: advances watermark past 10:10 → window emits
      mem.addData(Seq(TsEv(t("2024-01-01 10:25:00"), "a", 8.0)))
      q.processAllAvailable()
      // batch 3: LATE row for the closed window — must be dropped (W5)
      mem.addData(Seq(TsEv(t("2024-01-01 10:01:00"), "a", 100.0)))
      q.processAllAvailable()
      // batch 4: advance watermark past 10:30 to flush the 10:20 window
      mem.addData(Seq(TsEv(t("2024-01-01 10:45:00"), "b", 16.0)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("win")
      .select("stt", "key", "pv", "amount")
      .as[(String, String, Long, Double)].collect().toSet
    // the late 100.0 row appears nowhere; on-time rows match the batch agg
    assert(got == Set(
      ("2024-01-01 10:00:00", "a", 2L, 3.0),
      ("2024-01-01 10:00:00", "b", 1L, 4.0),
      ("2024-01-01 10:20:00", "a", 1L, 8.0)))
  }

  test("streaming session_window == batch session windows (W10 streaming form)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[TsEv]
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(session_window(col("ts"), "30 seconds").as("w"), col("key"))
        .agg(count(lit(1)).as("pv"), sum(col("v")).as("amount"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
          col("key"), col("pv"), col("amount"))
    val q = agg(mem.toDF().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    val data = Seq(
      TsEv(t("2024-01-01 10:00:00"), "a", 1.0),
      TsEv(t("2024-01-01 10:00:10"), "a", 2.0),  // gap 10 s → same session
      TsEv(t("2024-01-01 10:00:50"), "a", 4.0),  // gap 40 s → NEW session
      TsEv(t("2024-01-01 10:00:05"), "b", 8.0))
    val flush = TsEv(t("2024-01-01 11:00:00"), "z", 0.0)
    try {
      mem.addData(data); q.processAllAvailable()
      mem.addData(Seq(flush)); q.processAllAvailable()  // close all sessions
      mem.addData(Seq(TsEv(t("2024-01-01 12:00:00"), "z", 0.0)))
      q.processAllAvailable()                            // close the flusher's
    } finally q.stop()
    val got = spark.table("sess")
      .as[(String, String, Long, Double)].collect().toSet
      .filter(_._2 != "z")
    val batch = agg(data.toDF())
      .as[(String, String, Long, Double)].collect().toSet
    assert(batch == Set(
      ("2024-01-01 10:00:00", "a", 2L, 3.0),
      ("2024-01-01 10:00:50", "a", 1L, 4.0),
      ("2024-01-01 10:00:05", "b", 1L, 8.0)))
    assert(got == batch) // gap-merge agrees, each session emitted once
  }

  test("batch tumbling window produces identical buckets and metadata") {
    val df = Seq(
      TsEv(t("2024-01-01 10:00:01"), "a", 1.0),
      TsEv(t("2024-01-01 10:03:00"), "a", 2.0),
      TsEv(t("2024-01-01 10:09:59"), "b", 4.0),
      TsEv(t("2024-01-01 10:25:00"), "a", 8.0)).toDF()
    val agg = WindowOps.tumbling(df, col("ts"), "10 minutes", Seq(col("key")))
      .agg(count(lit(1)).as("pv"), sum(col("v")).as("amount"))
    val got = WindowOps.withWindowMeta(agg)
      .select("stt", "edt", "cur_date", "key", "pv", "amount")
      .as[(String, String, String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("2024-01-01 10:00:00", "2024-01-01 10:10:00", "2024-01-01", "a", 2L, 3.0),
      ("2024-01-01 10:00:00", "2024-01-01 10:10:00", "2024-01-01", "b", 1L, 4.0),
      ("2024-01-01 10:20:00", "2024-01-01 10:30:00", "2024-01-01", "a", 1L, 8.0)))
  }

  test("streaming daily OHLC == the batch a22 bars (struct-argmin/argmax in a watermarked window)") {
    // the REAL sf0.001 events streamed chronologically in two chunks
    // (one mid-stream state-carryover boundary), then a far-future
    // sentinel batch advances the watermark past the last day so every
    // real window flushes in append mode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("ts"), col("event_id"), col("event_type"), col("value"))
      .as[(Timestamp, Long, String, Double)].collect()
      .map { case (ts, id, et, v) => Oe(ts, id, et, v) }
      .sortBy(e => (e.ts.getTime, e.event_id))
    val sentinel = Oe(new Timestamp(rows.last.ts.getTime + 30L * 86400000L),
      -1L, "zz_sentinel", 0.0)
    val chunks = rows.grouped((rows.length + 1) / 2).map(_.toSeq).toSeq :+
      Seq(sentinel)
    val mem = MemoryStream[Oe]
    val out = Windows.tumblingAgg(mem.toDF(), "ts", "1 day", "2 seconds",
      Seq(col("event_type")), Seq(
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        count(lit(1)).as("n")))
      .select(col("cur_date"), col("event_type"), col("o.value").as("open"),
        col("high"), col("low"), col("c.value").as("close"), col("n"))
    val q = out.writeStream.format("memory").queryName("ohlc")
      .outputMode(OutputMode.Append()).start()
    try chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("ohlc")
      .filter(col("event_type") =!= "zz_sentinel")
      .as[(String, String, Double, Double, Double, Double, Long)]
      .collect().toSet
    val batch = graft.SparkEntry.queries("a22_ohlc")(spark, sf)
      .as[(String, String, Double, Double, Double, Double, Long)]
      .collect().toSet
    assert(got == batch)
  }
}
