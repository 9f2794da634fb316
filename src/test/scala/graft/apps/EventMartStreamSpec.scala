package graft.apps

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec
import graft.queries.CoreQueries
import graft.sources.Tables

/** The streaming mart tier's correctness gate: after every micro-batch
  * each mart VIEW equals its batch frame function over the event
  * prefix consumed so far (stream == batch, the contract every
  * streaming twin in this engine carries), a replayed batch changes
  * nothing (foreachBatch restart redelivery), and a crash injected
  * between ANY two table mutations of a batch converges to the exact
  * batch answer on re-run — the staged-delta + per-bucket batch-stamp
  * machinery, not just "roughly recovers". */
class EventMartStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // events sorted by (ts, event_id): chunked delivery then satisfies
  // the per-user non-decreasing contract the stateful marts document
  private lazy val allRows: Seq[Row] = Tables.events(spark, sf)
    .select("user_id", "ts", "event_id", "event_type", "value")
    .orderBy("ts", "event_id").collect().toSeq
  private lazy val schema = Tables.events(spark, sf)
    .select("user_id", "ts", "event_id", "event_type", "value").schema

  private def frame(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  private def chunks(n: Int): Seq[Seq[Row]] = {
    val size = math.max(1, allRows.length / n)
    allRows.grouped(size).toSeq
  }

  private def rowsOf(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet.map((r: Row) => r.toSeq)

  private def assertMartsEqual(dir: String, prefix: Seq[Row],
                               where: String): Unit = {
    val ev = frame(prefix)
    val checks = Seq(
      ("daily_uv", EventMartStream.dailyUv(spark, dir),
        CoreQueries.dailyUvFrom(ev)),
      ("transitions", EventMartStream.transitions(spark, dir),
        CoreQueries.transitionsFrom(ev)),
      ("ohlc", EventMartStream.ohlc(spark, dir),
        CoreQueries.ohlcFrom(ev)),
      ("session_paths", EventMartStream.sessionPaths(spark, dir),
        CoreQueries.sessionPathsFrom(ev)),
      ("decay_scores", EventMartStream.decayScores(spark, dir),
        CoreQueries.decayScoresFrom(ev)))
    checks.foreach { case (name, got, want) =>
      assert(rowsOf(got) == rowsOf(want), s"$where: mart $name != batch")
    }
  }

  test("stream == batch after every micro-batch; replay is a no-op") {
    val dir = Files.createTempDirectory("mart-str").toString
    val cs = chunks(5)
    var consumed = Seq.empty[Row]
    cs.zipWithIndex.foreach { case (c, i) =>
      EventMartStream.processBatch(frame(c), i.toLong, dir)
      consumed ++= c
      assertMartsEqual(dir, consumed, s"after batch $i")
    }
    // restart redelivery: the LAST batch replays with the same id and
    // content — every mart must be byte-for-byte unchanged
    EventMartStream.processBatch(frame(cs.last), (cs.length - 1).toLong, dir)
    assertMartsEqual(dir, consumed, "after replaying the last batch")
  }

  test("a crash between any two table mutations converges exactly on re-run") {
    val cs = chunks(3)
    // 7 mutation points per batch (uv, ohlc, decay, trans_counts,
    // trans_state, sess_grid, sess_state)
    (0 until 7).foreach { s =>
      val dir = Files.createTempDirectory(s"mart-crash$s").toString
      EventMartStream.processBatch(frame(cs.head), 0L, dir)
      try {
        EventMartStream.crashAfterStage = s
        intercept[IllegalStateException] {
          EventMartStream.processBatch(frame(cs(1)), 1L, dir)
        }
      } finally EventMartStream.crashAfterStage = Int.MaxValue
      // the replayed batch must land the EXACT batch answer — the
      // stateful marts reuse their staged pre-state deltas, the
      // additive marts skip their already-stamped buckets
      EventMartStream.processBatch(frame(cs(1)), 1L, dir)
      assertMartsEqual(dir, cs.head ++ cs(1), s"crash at stage $s")
    }
  }

  test("transition/session views read EMPTY before their first non-empty delta") {
    // trans_counts / sess_grid are created by the first batch whose
    // DELTA is non-empty — which can lag indefinitely (no user has a
    // second event yet, no session has closed). The views must serve
    // empty frames, not throw PATH_NOT_FOUND, while sibling marts work.
    val dir = Files.createTempDirectory("mart-young").toString
    assert(EventMartStream.transitions(spark, dir).collect().isEmpty)
    assert(EventMartStream.sessionPaths(spark, dir).collect().isEmpty)
  }

  test("the foreachBatch wiring runs the same pipeline") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = Files.createTempDirectory("mart-wire").toString
    val cs = chunks(3)
    // MemoryStream carries tuples; rebuild the event shape (µs → ts)
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val q = EventMartStream.stream(
      mem.toDF().toDF("user_id", "us", "event_id", "event_type", "value")
        .selectExpr("user_id", "timestamp_micros(us) as ts", "event_id",
          "event_type", "value"),
      dir, Files.createTempDirectory("mart-wire-ckpt").toString)
    try {
      cs.foreach { c =>
        mem.addData(c.map(r => (r.getLong(0),
          r.getTimestamp(1).getTime * 1000 +
            (r.getTimestamp(1).getNanos / 1000) % 1000,
          r.getLong(2), r.getString(3), r.getDouble(4))))
        q.processAllAvailable()
      }
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    } finally q.stop()
    assertMartsEqual(dir, allRows, "after the streamed run")
  }
}
