package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.JoinOps

case class OrderEv(oid: Long, ots: Timestamp, amount: Double)
case class PayEv(pid: Long, poid: Long, pts: Timestamp)
case class DetailEv(did: Long, doid: Long, dts: Timestamp, amount: Double)
case class InfoEv(ioid: Long, its: Timestamp, uid: Long)
case class ActEv(aid: Long, adid: Long, ats: Timestamp)
case class CoupEv(cid: Long, cdid: Long, cts: Timestamp)

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

  test("4-way chained streaming join (detail ⋈ info ⟕ activity ⟕ coupon) == batch (J1/J2 capstone)") {
    // The reference's DwdTradeOrderDetail (order_detail ⋈ order_info ⟕
    // activity ⟕ coupon in ONE job, DwdTradeOrderDetail.java:122-169).
    // Every join carries an event-time bound so state is watermark-bounded
    // (the Spark form of the reference's idle-state TTL), and the two left
    // joins exercise the null-pad-at-watermark story chained: a detail
    // missing activity AND coupon must flush exactly once as (d, null,
    // null) — no retraction, no duplicate from the second left join.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val details = MemoryStream[DetailEv]
    val infos = MemoryStream[InfoEv]
    val acts = MemoryStream[ActEv]
    val coups = MemoryStream[CoupEv]

    def chain(detail: org.apache.spark.sql.DataFrame,
              info: org.apache.spark.sql.DataFrame,
              act: org.apache.spark.sql.DataFrame,
              coup: org.apache.spark.sql.DataFrame) =
      detail
        .join(info, col("doid") === col("ioid") &&
          col("its") >= col("dts") - expr("INTERVAL 10 SECONDS") &&
          col("its") <= col("dts") + expr("INTERVAL 10 SECONDS"))
        .join(act, col("adid") === col("did") &&
          col("ats") >= col("dts") &&
          col("ats") <= col("dts") + expr("INTERVAL 10 SECONDS"), "leftOuter")
        .join(coup, col("cdid") === col("did") &&
          col("cts") >= col("dts") &&
          col("cts") <= col("dts") + expr("INTERVAL 10 SECONDS"), "leftOuter")
        .select(col("did"), col("uid"), col("aid"), col("cid"))

    val q = chain(
      details.toDF().withWatermark("dts", "0 seconds"),
      infos.toDF().withWatermark("its", "0 seconds"),
      acts.toDF().withWatermark("ats", "0 seconds"),
      coups.toDF().withWatermark("cts", "0 seconds"))
      .writeStream.format("memory").queryName("chain4")
      .outputMode(OutputMode.Append()).start()

    val allD = Seq(
      DetailEv(1, 10, t("2024-01-01 10:00:00"), 5.0), // activity + coupon
      DetailEv(2, 10, t("2024-01-01 10:00:01"), 6.0), // activity only
      DetailEv(3, 20, t("2024-01-01 10:00:02"), 7.0), // neither → (3,null,null)
      DetailEv(4, 99, t("2024-01-01 10:00:03"), 8.0)) // no order → dropped
    val allI = Seq(
      InfoEv(10, t("2024-01-01 10:00:00"), 7), InfoEv(20, t("2024-01-01 10:00:02"), 8))
    val allA = Seq(ActEv(100, 1, t("2024-01-01 10:00:04")),
      ActEv(101, 2, t("2024-01-01 10:00:05")),
      ActEv(102, 3, t("2024-01-01 10:05:00"))) // outside the 10 s bound
    val allC = Seq(CoupEv(200, 1, t("2024-01-01 10:00:06")))
    // watermark flushers, far past every join window
    val flushD = DetailEv(90, 999, t("2024-01-01 12:00:00"), 0.0)
    val flushI = InfoEv(999, t("2024-01-01 12:00:00"), 0)
    val flushA = ActEv(900, 999, t("2024-01-01 12:00:00"))
    val flushC = CoupEv(901, 999, t("2024-01-01 12:00:00"))

    try {
      details.addData(allD); infos.addData(allI)
      acts.addData(allA); coups.addData(allC)
      q.processAllAvailable()
      // two rounds of watermark advancement: the null-pad of the FIRST
      // left join must itself flow through (and flush out of) the second
      for (i <- 1 to 3) {
        details.addData(Seq(flushD.copy(did = 90 + i)))
        infos.addData(Seq(flushI)); acts.addData(Seq(flushA))
        coups.addData(Seq(flushC))
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("chain4")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      .filter(_._1 < 90) // drop flusher rows

    // batch twin over the identical fixture (flushers included upstream)
    val batch = chain(
        (allD ++ Seq(flushD)).toDF(), (allI ++ Seq(flushI)).toDF(),
        (allA ++ Seq(flushA)).toDF(), (allC ++ Seq(flushC)).toDF())
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      .filter(_._1 < 90)

    assert(batch == Set(
      (1L, 7L, Some(100L), Some(200L)),
      (2L, 7L, Some(101L), None),
      (3L, 8L, None, None)))
    assert(got == batch) // stream == batch, exactly once each
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
