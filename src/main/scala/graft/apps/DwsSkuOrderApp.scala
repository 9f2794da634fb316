package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.GraftSession
import graft.operators.WindowOps
import graft.sinks.Sinks
import graft.sources.Streams

/** The reference's richest pipeline as a runnable app
  * (`app/dws/DwsTradeSkuOrderWindow.java`, SURVEY §3.1): JSON order-detail
  * stream → tolerant parse + watermark → keyed dedup (undo upstream
  * emit-then-retract duplicates) → tumbling windowed aggregation at sku
  * grain → broadcast dim enrichment → keyed upsert sink.
  *
  * Runs with `Trigger.AvailableNow`: process everything currently in the
  * source, checkpoint, exit — the batch-operable form of the continuous
  * job (re-running resumes from the checkpoint; `AppSpec` drives exactly
  * that). Swap `Streams.fileJson` for `Streams.kafkaJson` and drop the
  * trigger for the continuous deployment.
  *
  * Usage: `runMain graft.apps.DwsSkuOrderApp <srcDir> <dimParquet> <outDir> <checkpointDir>`
  */
object DwsSkuOrderApp {

  val inputSchema: StructType = StructType(Seq(
    StructField("order_detail_id", LongType),
    StructField("sku", LongType),
    StructField("amount", DoubleType),
    StructField("ts_sec", LongType)))

  /** Build the windowed-aggregation stream from a parsed, watermarked
    * order-detail stream. Dedup state is bounded by the watermark
    * (`dropDuplicatesWithinWatermark`) — plain `dropDuplicates` on a
    * non-event-time subset never evicts and grows state forever in the
    * continuous deployment; the reference bounds the same state with a
    * TTL (`DwsTradeSkuOrderWindow.java:118-119`). */
  def aggregate(parsed: DataFrame): DataFrame =
    WindowOps.withWindowMeta(
      parsed
        .dropDuplicatesWithinWatermark("order_detail_id")
        .groupBy(window(col("rt"), "10 minutes"), col("sku"))
        .agg(count(lit(1)).as("n_orders"), sum(col("amount")).as("amount")))

  /** Run one AvailableNow pass; returns when the source is drained. */
  def run(spark: SparkSession, srcDir: String, dimPath: String,
          outDir: String, ckptDir: String): Unit = {
    val parsed = Streams.fileJson(spark, srcDir, inputSchema, "ts_sec",
      delay = "2 seconds")
    val q = aggregate(parsed).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dim = batch.sparkSession.read.parquet(dimPath) // hot-reloadable
        val enriched = batch.join(broadcast(dim), Seq("sku"), "left")
        Sinks.upsertKeyed(batch.sparkSession,
          enriched.withColumn("__b", lit(batchId)),
          keys = Seq("stt", "sku"), order = Seq("__b"), path = outDir,
          dropCols = Seq("__b"))
      }
      .start()
    q.awaitTermination()
  }

  def main(args: Array[String]): Unit = {
    val Array(src, dim, out, ckpt) = args
    val spark = GraftSession.local("graft-dws-sku-order")
    try run(spark, src, dim, out, ckpt) finally spark.stop()
  }
}
