package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.GraftSession
import graft.sinks.Sinks
import graft.sources.Streams

/** The reference's capstone DWD assembly — `DwdTradeOrderDetail`
  * (`app/dwd/DwdTradeOrderDetail.java:122-219`): order_detail ⋈
  * order_info ⟕ activity ⟕ coupon in ONE streaming job, upserted by
  * detail id — built from the engine's pieces: four watermarked JSON
  * file streams (S2 twins), a chained time-bound stream-stream join
  * (J1 + two J2s, state bounded by the event-time conditions — the
  * Spark form of the reference's 10 s idle-state TTL), and the
  * incremental keyed-upsert sink (K3, last-wins under the batch id so
  * crash-replays merge idempotently).
  *
  * Usage: `runMain graft.apps.DwdOrderDetailApp <detailDir> <infoDir>
  *   <activityDir> <couponDir> <outDir> <checkpointDir>`
  */
object DwdOrderDetailApp {

  val detailSchema: StructType = StructType(Seq(
    StructField("order_detail_id", LongType), StructField("order_id", LongType),
    StructField("sku_id", LongType), StructField("amount", DoubleType),
    StructField("d_ts", LongType)))
  val infoSchema: StructType = StructType(Seq(
    StructField("o_id", LongType), StructField("user_id", LongType),
    StructField("province_id", LongType), StructField("o_ts", LongType)))
  val activitySchema: StructType = StructType(Seq(
    StructField("a_order_detail_id", LongType),
    StructField("activity_id", LongType), StructField("a_ts", LongType)))
  val couponSchema: StructType = StructType(Seq(
    StructField("c_order_detail_id", LongType),
    StructField("coupon_id", LongType), StructField("c_ts", LongType)))

  /** The 4-way chained join; every join carries an event-time bound so
    * join state is watermark-evicted. Works identically on batch frames
    * (the spec's twin) and watermarked streams. */
  def assemble(detail: DataFrame, info: DataFrame,
               activity: DataFrame, coupon: DataFrame): DataFrame =
    detail
      .join(info, col("order_id") === col("o_id") &&
        col("ots") >= col("dts") - expr("INTERVAL 10 SECONDS") &&
        col("ots") <= col("dts") + expr("INTERVAL 10 SECONDS"))
      .join(activity, col("a_order_detail_id") === col("order_detail_id") &&
        col("ats") >= col("dts") &&
        col("ats") <= col("dts") + expr("INTERVAL 10 SECONDS"), "leftOuter")
      .join(coupon, col("c_order_detail_id") === col("order_detail_id") &&
        col("cts") >= col("dts") &&
        col("cts") <= col("dts") + expr("INTERVAL 10 SECONDS"), "leftOuter")
      .select(col("order_detail_id"), col("order_id"), col("user_id"),
        col("province_id"), col("sku_id"), col("amount"),
        col("activity_id"), col("coupon_id"), col("dts"))

  /** One AvailableNow pass over whatever files exist; restartable from
    * the checkpoint (a resumed run processes only new files and upserts
    * into the same table). */
  def run(spark: SparkSession, detailDir: String, infoDir: String,
          activityDir: String, couponDir: String,
          outDir: String, ckptDir: String): Unit = {
    def src(dir: String, schema: StructType, tsCol: String, rtName: String) =
      Streams.fileJson(spark, dir, schema, tsCol, delay = "2 seconds")
        .withColumnRenamed("rt", rtName)
    val joined = assemble(
      src(detailDir, detailSchema, "d_ts", "dts"),
      src(infoDir, infoSchema, "o_ts", "ots"),
      src(activityDir, activitySchema, "a_ts", "ats"),
      src(couponDir, couponSchema, "c_ts", "cts"))
    val q = joined.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sinks.upsertKeyed(batch.sparkSession,
          batch.withColumn("__b", lit(batchId)),
          keys = Seq("order_detail_id"), order = Seq("__b"),
          path = outDir, dropCols = Seq("__b"))
      }
      .start()
    q.awaitTermination()
  }

  def main(args: Array[String]): Unit = {
    val Array(d, i, a, c, out, ckpt) = args
    val spark = GraftSession.local("graft-dwd-order-detail")
    try run(spark, d, i, a, c, out, ckpt) finally spark.stop()
  }
}
