package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.DedupOps

/** Sink layer — local-filesystem analogues of the reference's connector
  * sinks (Kafka topics / HBase / Doris become parquet directories; the
  * topology — fixed target, per-record dynamic target, keyed upsert — is
  * the part that carries over).
  *
  *  - K1 fixed-topic append           (`util/KafkaUtil.java:55-60`)
  *  - K2 dynamic per-record topic     (`app/dwd/DwdBaseApp.java:100-106` —
  *    topic taken from a column of the record)
  *  - K3 keyed upsert, last-wins      (upsert-kafka DDLs, e.g.
  *    `app/dwd/DwdTradeOrderDetail.java:174-219`)
  *  - K4 dim upsert                   (`app/dim/func/DimSinkFunction.java:40-62`
  *    — same merge, keyed by table+rowkey)
  *  - K7 debug/print sink             (`print()` calls throughout the apps)
  *
  * Exactly-once (R1/R2): streaming variants take a mandatory checkpoint
  * directory; Structured Streaming's WAL + idempotent batch-id tracking in
  * `foreachBatch` give end-to-end exactly-once on restart, replacing the
  * reference's Flink checkpoint + two-phase-commit Kafka producer. The
  * restart path is asserted in `SinksSpec` (stop mid-stream, restart,
  * no duplicates).
  */
object Sinks {

  /** K1 — append to a fixed target. */
  def appendFixed(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** K2 — per-record dynamic routing: the target directory comes from a
    * COLUMN (`partitionBy`), one pass, no per-target scan. Hive-style
    * `topic=<v>/` subdirs are the topic fan-out. */
  def dynamicByColumn(df: DataFrame, topicCol: String, path: String): Unit =
    df.write.mode("append").partitionBy(topicCol).parquet(path)

  /** K3/K4 — keyed upsert, deterministic last-wins under `order`.
    * Merge = union(current, incoming) → keep-last per key → rename-based
    * swap: the live table is renamed aside BEFORE the staged result takes
    * its place, so a crash at any single point leaves either the old or
    * the new table intact on disk (never neither). The swap is still two
    * renames, not one atomic commit — readers can race the window between
    * them, and a crash inside it needs the `.old` dir restored by hand; a
    * transactional table format (MERGE INTO) is the production answer. */
  def upsertKeyed(spark: SparkSession, incoming: DataFrame, keys: Seq[String],
                  order: Seq[String], path: String,
                  dropCols: Seq[String] = Nil): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val current =
      if (fs.exists(target)) Some(spark.read.parquet(path)) else None
    val merged = current match {
      case Some(cur) => cur.unionByName(incoming, allowMissingColumns = true)
      case None => incoming
    }
    val deduped = DedupOps.keepLast(merged, keys.map(col), order.map(col))
    overwriteSwapped(spark, deduped.drop(dropCols: _*), path)
  }

  /** Replace the table at `path` with `df` via stage → move old aside →
    * promote staged → drop old: no point in this sequence has zero live
    * copies on disk. `df` MAY read from `path` itself (it is staged to a
    * side directory before the live table moves). */
  def overwriteSwapped(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val tmp = new Path(path + ".staging")
    val old = new Path(path + ".old")
    // Hadoop FS mutations report failure by RETURNING false, not
    // throwing — an unchecked rename followed by the delete below would
    // silently destroy the only live copy. Fail loudly instead.
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(s"$what failed for $path")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) {
      // leftover from a crash inside a previous swap: only safe to drop
      // when a live target exists; otherwise it IS the last copy — restore
      if (fs.exists(target)) must(fs.delete(old, true), "delete stale .old")
      else must(fs.rename(old, target), "restore .old")
    }
    val hadCurrent = fs.exists(target)
    if (hadCurrent) must(fs.rename(target, old), "move live aside")
    must(fs.rename(tmp, target), "promote staged")
    if (hadCurrent) must(fs.delete(old, true), "drop old")
  }

  /** K7 — debug sink. */
  def debug(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  // ------------------------------------------------------------- streaming

  /** K1 streaming — checkpointed parquet append (exactly-once to files). */
  def streamAppend(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()

  /** K2 streaming — dynamic per-record target via foreachBatch. */
  def streamDynamic(df: DataFrame, topicCol: String, path: String,
                    checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dynamicByColumn(batch, topicCol, path)
      }
      .start()

  /** K3 streaming — keyed upsert per micro-batch. The batch id joins the
    * ordering so replayed batches (restart recovery) merge idempotently:
    * re-applying the same (key, order, batch) rows leaves the table
    * unchanged. */
  def streamUpsert(df: DataFrame, keys: Seq[String], order: Seq[String],
                   path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertKeyed(batch.sparkSession,
          batch.withColumn("__upsert_batch", lit(batchId)),
          keys, order :+ "__upsert_batch", path,
          dropCols = Seq("__upsert_batch"))
      }
      .start()
}
