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
        CoreQueries.decayScoresFrom(events)).map(
        _.queryExecution.executedPlan.toString)
      plans.foreach { p =>
        assert(p.contains("InMemoryTableScan"),
          s"mart plan does not read the cache:\n$p")
        // the InMemoryRelation node PRINTS the scan it was built from —
        // only a FileScan ABOVE the cache node is a real re-scan
        val aboveCache = p.substring(0, p.indexOf("InMemoryRelation"))
        assert(!aboveCache.contains("FileScan parquet"),
          s"mart plan re-scans the source parquet:\n$p")
      }
    } finally { events.unpersist(); () }
  }
}
