package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.queries.CoreQueries
import graft.sources.Tables

/** Multi-mart assembly over ONE events scan: daily UV (a3's frame),
  * the transition matrix (a19), daily OHLC bars (a22), session
  * entry/exit paths (a24) and half-life decay scores (a26) written as
  * five parquet marts from a single cached pass over the source.
  *
  * The reference computes each DWS mart as its own job re-reading the
  * source topic (one Kafka re-read per `app/dws` class); at
  * 100 TB the repeated source scan IS the dominant cost of a mart
  * tier. Here the source is persisted once and every mart's plan reads
  * the `InMemoryTableScan` (spec-asserted: after the first
  * materialization, NO mart plan contains a parquet scan of events) —
  * the five marts still shuffle independently on their own keys, which
  * is unavoidable and correct; only the redundant source I/O is gone.
  *
  * The mart bodies are the SAME frame-based functions the registered
  * oracle queries call (`CoreQueries.dailyUvFrom` etc.), so the app
  * cannot drift from the hash-gated semantics. */
object EventMartApp {

  /** Build all five marts under `outDir`; returns mart → row count. */
  def run(spark: SparkSession, sfDir: String,
          outDir: String): Map[String, Long] = {
    val events = Tables.events(spark, sfDir)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val marts = Seq(
        "daily_uv" -> CoreQueries.dailyUvFrom(events),
        "transitions" -> CoreQueries.transitionsFrom(events),
        "ohlc" -> CoreQueries.ohlcFrom(events),
        "session_paths" -> CoreQueries.sessionPathsFrom(events),
        "decay_scores" -> CoreQueries.decayScoresFrom(events))
      marts.map { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$outDir/$name")
        name -> spark.read.parquet(s"$outDir/$name").count()
      }.toMap
    } finally { events.unpersist(); () }
  }

  /** Usage: `runMain graft.apps.EventMartApp <sfDir> <outDir>`. */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = graft.GraftSession.local("graft-event-mart")
    try {
      val counts = run(spark, sfDir, outDir)
      println(s"[event-mart] built ${counts.size} marts: " +
        counts.toSeq.sortBy(_._1).map { case (n, c) => s"$n=$c" }
          .mkString(", "))
    } finally spark.stop()
  }
}
