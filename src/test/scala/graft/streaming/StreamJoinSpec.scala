package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.JoinOps

case class OrderEv(oid: Long, ots: Timestamp, amount: Double)
case class PayEv(pid: Long, poid: Long, pts: Timestamp)

/** Streaming forms of J1/J2/J4: watermarked stream-stream joins with an
  * event-time bound replacing the reference's idle-state TTL
  * (`app/dwd/DwdTradeOrderDetail.java:29-31,122-169` — TTL 10 s stands in
  * for "the 4 tables are generated simultaneously"). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("stream-stream inner join with time bound == batch interval join (J1/J4)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val orders = MemoryStream[OrderEv]
    val pays = MemoryStream[PayEv]
    val joined = JoinOps.intervalJoin(
      orders.toDF().withWatermark("ots", "0 seconds"),
      pays.toDF().withWatermark("pts", "0 seconds"),
      col("oid"), col("poid"), col("ots"), col("pts"),
      expr("INTERVAL 0 SECONDS"), expr("INTERVAL 10 SECONDS"))
      .select(col("oid"), col("pid"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try {
      orders.addData(Seq(
        OrderEv(1, t("2024-01-01 10:00:00"), 5.0),
        OrderEv(2, t("2024-01-01 10:00:30"), 6.0)))
      q.processAllAvailable()
      pays.addData(Seq(
        PayEv(100, 1, t("2024-01-01 10:00:05")), // within 10 s of order 1
        PayEv(101, 2, t("2024-01-01 10:02:00")), // too late after order 2
        PayEv(102, 9, t("2024-01-01 10:00:05")))) // no matching order
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssj").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L)))
  }

  test("stream-stream LEFT join emits null-padded rows at watermark (J2)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val orders = MemoryStream[OrderEv]
    val pays = MemoryStream[PayEv]
    val joined = orders.toDF().withWatermark("ots", "0 seconds")
      .join(pays.toDF().withWatermark("pts", "0 seconds"),
        col("oid") === col("poid") &&
          col("pts") >= col("ots") &&
          col("pts") <= col("ots") + expr("INTERVAL 10 SECONDS"),
        "leftOuter")
      .select(col("oid"), col("pid"))
    val q = joined.writeStream.format("memory").queryName("sslj")
      .outputMode(OutputMode.Append()).start()
    try {
      orders.addData(Seq(
        OrderEv(1, t("2024-01-01 10:00:00"), 5.0),
        OrderEv(2, t("2024-01-01 10:00:01"), 6.0)))
      pays.addData(Seq(PayEv(100, 1, t("2024-01-01 10:00:05"))))
      q.processAllAvailable()
      // advance BOTH watermarks far past the join window so order 2's
      // null-padded row flushes (Spark emits unmatched rows only once the
      // watermark proves no match can still arrive — no retractions)
      orders.addData(Seq(OrderEv(99, t("2024-01-01 11:00:00"), 0.0)))
      pays.addData(Seq(PayEv(999, 98, t("2024-01-01 11:00:00"))))
      q.processAllAvailable()
      orders.addData(Seq(OrderEv(97, t("2024-01-01 12:00:00"), 0.0)))
      pays.addData(Seq(PayEv(997, 96, t("2024-01-01 12:00:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sslj").as[(Long, Option[Long])].collect().toSet
    assert(got.contains((1L, Some(100L))))
    assert(got.contains((2L, None))) // null-padded after watermark — no retraction needed
  }

  test("keepLastEventTime flushes the key's latest record on the event-time timer (A6/W9)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[OrderEv]
    val out = StatefulOps.keepLastEventTime[Long, OrderEv](
      mem.toDF().withWatermark("ots", "0 seconds").as[OrderEv],
      _.oid, _.ots.getTime, delayMs = 5000L)
    val q = out.writeStream.format("memory").queryName("klet")
      .outputMode(OutputMode.Append()).start()
    try {
      // two versions of key 1 inside one 5 s timer window
      mem.addData(Seq(
        OrderEv(1, t("2024-01-01 10:00:00"), 1.0),
        OrderEv(1, t("2024-01-01 10:00:02"), 2.0)))
      q.processAllAvailable()
      // watermark jumps past 10:00:07 → key 1's timer fires, latest wins
      mem.addData(Seq(OrderEv(2, t("2024-01-01 10:30:00"), 9.0)))
      q.processAllAvailable()
      mem.addData(Seq(OrderEv(3, t("2024-01-01 11:00:00"), 9.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("klet").as[OrderEv].collect()
    val k1 = got.filter(_.oid == 1)
    assert(k1.length == 1 && k1.head.amount == 2.0) // ONE emission, the LAST version
  }
}
