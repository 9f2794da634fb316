package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.CdcOps

/** Streaming source layer — the reference's Kafka JSON tables (S1/S2,
  * `util/KafkaUtil.java:25-53`, `util/FlinkSqlUtil.java:8-31`) as
  * watermarked streaming DataFrames.
  *
  * The shared shape: value bytes → string → tolerant JSON parse with a
  * declared schema (P1) → event-time column `rt` from the epoch field →
  * bounded watermark (W2/W3). `kafkaJson` carries the Kafka wiring
  * (needs the spark-sql-kafka connector on the runtime classpath — not
  * bundled in this offline build); `fileJson` is the behaviorally
  * identical twin over a directory of JSON-line files, which is what the
  * specs drive end-to-end (and what checkpointed-restart tests use,
  * since the file source shares the same offset-tracking contract). */
object Streams {

  /** S1/S2 — Kafka topic of JSON values as a watermarked stream. */
  def kafkaJson(spark: SparkSession, brokers: String, topic: String,
                schema: StructType, tsSecCol: String, delay: String,
                startingOffsets: String = "latest"): DataFrame =
    jsonLines(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS value"),
      schema, tsSecCol, delay)

  /** S1/S2 file twin — JSON-line files appearing under `path`. */
  def fileJson(spark: SparkSession, path: String, schema: StructType,
               tsSecCol: String, delay: String): DataFrame =
    jsonLines(spark.readStream.text(path), schema, tsSecCol, delay)

  /** Shared parse stage: tolerant parse-or-drop, flatten, event-time
    * `rt` = timestamp_seconds(tsSecCol), bounded watermark. */
  def jsonLines(lines: DataFrame, schema: StructType, tsSecCol: String,
                delay: String): DataFrame =
    CdcOps.parseOrDrop(lines, "value", schema)
      .select(col("j.*"))
      .drop("_corrupt_record")
      .withColumn("rt", timestamp_seconds(col(tsSecCol)))
      .withWatermark("rt", delay)
}
