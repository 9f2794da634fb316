package graft.apps

import java.nio.file.Files

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec
import graft.queries.CoreQueries
import graft.sources.Tables

/** Gates for the multi-mart single-scan assembly: (1) every mart equals
  * its registered oracle query's output (the app cannot drift from the
  * hash-gated semantics), and (2) after the cache materializes, no mart
  * plan reads the events parquet again — the shared-scan claim as a
  * mechanical assertion, not prose. */
class EventMartAppSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("marts equal their registered oracle queries byte-for-byte") {
    val out = Files.createTempDirectory("event-mart").toString
    val counts = EventMartApp.run(spark, sf, out)
    assert(counts.keySet ==
      Set("daily_uv", "transitions", "ohlc", "session_paths",
        "decay_scores"))
    val pairs = Seq(
      "daily_uv" -> "a3_daily_uv",
      "transitions" -> "a19_event_transitions",
      "ohlc" -> "a22_ohlc",
      "session_paths" -> "a24_session_paths",
      "decay_scores" -> "a26_decay_score")
    for ((mart, query) <- pairs) {
      val got = spark.read.parquet(s"$out/$mart")
      val want = graft.SparkEntry.queries(query)(spark, sf)
      assert(got.columns.sorted.sameElements(want.columns.sorted),
        s"$mart schema drift")
      val cols = want.columns.toSeq
      assert(got.select(cols.head, cols.tail: _*).collect().toSet ==
        want.collect().toSet, s"$mart != $query")
      assert(counts(mart) == want.count())
    }
  }

  test("after materialization every mart plan reads the cache, not the parquet") {
    val events = Tables.events(spark, sf).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      events.count() // materialize: the ONE source scan
      val plans = Seq(
        CoreQueries.dailyUvFrom(events),
        CoreQueries.transitionsFrom(events),
        CoreQueries.ohlcFrom(events),
        CoreQueries.sessionPathsFrom(events),
        CoreQueries.decayScoresFrom(events))
      plans.foreach { df =>
        val plan = df.queryExecution.executedPlan
        val (fileScans, cacheScans) = scansAboveCache(plan)
        assert(cacheScans > 0,
          s"mart plan does not read the cache:\n$plan")
        // a FileSourceScan reachable WITHOUT crossing a cache node is a
        // real source re-scan — this catches one in ANY branch (a26's
        // plan reads the cache twice: probe + the broadcast refWeek
        // derivation), where a string-prefix check only saw the first
        assert(fileScans == 0,
          s"mart plan re-scans the source parquet:\n$plan")
      }
    } finally { events.unpersist(); () }
  }

  /** (parquet scans, cache scans) reachable from `p` without descending
    * into a cache node's provenance plan. Rides the shared
    * [[graft.SparkSpec.collectPlan]] walker (AQE wrappers, reused
    * exchanges AND subqueries are crossed — a private copy missing one
    * wrapper would make the no-re-scan gate vacuous; the cache node is
    * a leaf, so the walker already stops above the provenance plan). */
  private def scansAboveCache(
      p: org.apache.spark.sql.execution.SparkPlan): (Int, Int) = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val hits = collectPlan(p) {
      case _: FileSourceScanExec => 'f'
      case _: InMemoryTableScanExec => 'c'
    }
    (hits.count(_ == 'f'), hits.count(_ == 'c'))
  }
}
