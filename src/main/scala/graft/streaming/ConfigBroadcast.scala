package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Hot-reloading config plane — the Spark form of the reference's
  * broadcast-state config stream (`app/dim/DimApp.java:78-105`: a Flink-CDC
  * stream of `gmall_config.table_process` rows broadcast to all workers,
  * consulted per record).
  *
  * Spark-first re-expression: the config lives in a small table (parquet
  * dir here; JDBC/Delta on a cluster). Each micro-batch re-reads it and
  * joins/broadcasts it against the batch — config changes take effect at
  * the next micro-batch boundary, which is exactly the semantics of the
  * reference's broadcast state (eventual, per-element-consistent rule
  * application), without hand-rolled per-task mutable state. The re-read
  * is one tiny scan per batch; the join is a broadcast hash join, so the
  * fact stream is never shuffled by the config plane.
  */
object ConfigBroadcast {

  /** Run a stream where every micro-batch sees the CURRENT contents of
    * `configPath`. `apply` gets (batch, config) and writes its output. */
  def foreachBatchWithConfig(stream: DataFrame, configPath: String,
                             checkpoint: String)(
      apply: (DataFrame, DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val config = batch.sparkSession.read.parquet(configPath)
        apply(batch, config, batchId)
      }
      .start()
}
