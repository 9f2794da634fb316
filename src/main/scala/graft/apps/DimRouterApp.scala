package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.GraftSession
import graft.operators.CdcOps
import graft.sinks.Sinks

/** The reference's DIM router (`app/dim/DimApp.java:56-105`) assembled
  * from the engine's pieces: a Maxwell-style CDC envelope stream is
  * routed by a CONFIG TABLE (re-read every micro-batch — the broadcast-
  * state hot-reload plane, W6/J5) into one upserted dimension table per
  * configured source table, keeping only each rule's whitelisted columns
  * (P5) and honoring delete ops (S3 semantics).
  *
  * Usage: `runMain graft.apps.DimRouterApp <srcDir> <configParquet> <outRoot> <checkpointDir>`
  *  - config schema: (table STRING, sink_table STRING, columns STRING —
  *    comma-separated whitelist; `id` is always kept as the row key)
  *  - output: `<outRoot>/<sink_table>/` parquet, upserted by id
  */
object DimRouterApp {

  val envelopeSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", LongType),
    StructField("data", MapType(StringType, StringType))))

  /** Route one micro-batch against the CURRENT config.
    *
    * Delete ops are stored as TOMBSTONE rows, not physically purged: a
    * retained tombstone keeps winning the (ts, batch, seq) keep-last
    * against any late-arriving lower-ts event, so a deleted key cannot
    * be resurrected by out-of-order delivery. Read live rows with
    * [[readDim]]; a periodic compaction may purge tombstones older than
    * the pipeline's out-of-orderness bound. */
  def routeBatch(batch: DataFrame, config: DataFrame, outRoot: String,
                 batchId: Long): Unit = {
    val spark = batch.sparkSession
    // ts is second-granularity in Maxwell — an insert and its follow-up
    // update can tie; the arrival-order sequence breaks the tie so
    // keep-last has a total order (DedupOps' determinism contract).
    val parsed = CdcOps.parseOrDrop(
        batch.withColumn("__seq", monotonically_increasing_id()),
        "value", envelopeSchema)
      .select(col("j.table").as("table"), col("j.type").as("op"),
        col("j.ts").as("ts"), col("j.data").as("data"), col("__seq"))
      .filter(col("op").isin("insert", "update", "delete", "bootstrap-insert"))
    // ONE parse of the batch shared by every rule's sink (re-scanning the
    // source per rule is the X1 anti-pattern splitBy documents)
    val routed = parsed.join(broadcast(config), Seq("table"), "inner")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rules = config.collect() // config tables are small by contract
      rules.foreach { r =>
        val table = r.getAs[String]("table")
        val sinkTable = r.getAs[String]("sink_table")
        val allowed = r.getAs[String]("columns").split(",").map(_.trim).toSeq
        val rows = routed.filter(col("table") === table)
          .select(
            element_at(col("data"), "id").as("id"),
            (col("op") === "delete").as("__tombstone"),
            col("ts"), col("__seq"),
            CdcOps.filterColumns(col("data"), allowed).as("data"))
          .withColumn("__b", lit(batchId))
        Sinks.upsertKeyed(spark, rows, keys = Seq("id"),
          order = Seq("ts", "__b", "__seq"), path = s"$outRoot/$sinkTable",
          dropCols = Seq("__b", "__seq"))
      }
    } finally routed.unpersist()
  }

  /** Live view of a routed dim table (tombstones + layout col filtered). */
  def readDim(spark: SparkSession, path: String): DataFrame =
    Sinks.readKeyed(spark, path).filter(!col("__tombstone")).drop("__tombstone")

  /** One AvailableNow pass over the source; config re-read per batch. */
  def run(spark: SparkSession, srcDir: String, configPath: String,
          outRoot: String, ckptDir: String): Unit = {
    val q: StreamingQuery = spark.readStream.text(srcDir).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val config = batch.sparkSession.read.parquet(configPath)
        routeBatch(batch, config, outRoot, batchId)
      }
      .start()
    q.awaitTermination()
  }

  def main(args: Array[String]): Unit = {
    val Array(src, cfg, out, ckpt) = args
    val spark = GraftSession.local("graft-dim-router")
    try run(spark, src, cfg, out, ckpt) finally spark.stop()
  }
}
