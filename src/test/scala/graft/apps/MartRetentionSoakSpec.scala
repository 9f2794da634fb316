package graft.apps

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.CoreQueries
import graft.sinks.Sinks

/** The mart tier's state-retention gate (the r9 verdict's task #3 —
  * "the mart tier's keyed state has no retention policy"): under a
  * LONG stream with a rotating user population and event time crossing
  * the 63-week decay horizon,
  *
  *  - every keyed state table PLATEAUS: `trans_state` / `sess_state`
  *    hold only users active within the TTL, `decay_weeks` only weeks
  *    inside the 63-week contribution window — instead of one row per
  *    user / (user, week) forever;
  *  - every mart output stays EQUAL to the full-history batch
  *    recompute at every checkpoint. Decay is exact unconditionally
  *    (retired weeks migrate into per-user sentinel rows holding their
  *    shift-frozen contribution, one atomic commit per sweep);
  *    sessions are exact because an idle-≥-gap session
  *    is closed in the batch view too; transitions are exact within
  *    the retention window — this soak's users never return after
  *    their TTL, the documented W7 semantics.
  *
  * Data shape: user-step s owns users [sU, (s+1)U), active in batches
  * s and s+1; batch i's events sit in week 4i (three events, minutes
  * apart — one session per user per batch; consecutive active batches
  * are 4 weeks apart, far beyond the 30-min session gap). TTLs are 6
  * weeks (= 1.5 batch periods): state expires two-three batches after
  * a user's last activity, never while active. */
class MartRetentionSoakSpec extends SparkSpec {
  import spark.implicits._

  private val U = 3          // users per rotation step
  private val NB = 36        // batches; weeks reach 4*35 = 140 > 63
  private val WeekUs = 7L * 86400 * 1000 * 1000
  private val ttlUs = 6L * WeekUs

  private val retention = EventMartStream.Retention(
    decaySweepEveryN = 1,
    sessTtlUs = Some(ttlUs),
    transTtlUs = Some(ttlUs),
    ttlSweepEveryN = 1)

  /** Batch i: users of steps i-1 and i, three events each in week 4i. */
  private def batchRows(i: Int): Seq[(Long, Long, Long, String, Double)] = {
    val users = (math.max(0, i - 1) * U until (i + 1) * U).map(_.toLong)
    users.flatMap { u =>
      (0 until 3).map { j =>
        val us = 4L * i * WeekUs + u * 60L * 1000000 * 17 +
          j * 5L * 60 * 1000000
        val eid = (i.toLong * 1000 + u) * 10 + j
        val typ = s"t${(u + j) % 3}"
        (u, us, eid, typ, 1.0 + (u % 7) * 0.25)
      }
    }
  }

  private def frame(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame =
    rows.toDF("user_id", "us", "event_id", "event_type", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("event_type"), col("value"))

  private def rowsOf(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet.map((r: Row) => r.toSeq)

  private def assertMartsEqual(dir: String,
                               prefix: Seq[(Long, Long, Long, String, Double)],
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

  private def stateCount(dir: String, table: String): Long = {
    val p = new Path(s"$dir/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L else Sinks.readKeyed(spark, s"$dir/$table").count()
  }

  test("state plateaus under a rotating stream while every mart stays exact") {
    val dir = Files.createTempDirectory("mart-ret").toString
    var consumed = Seq.empty[(Long, Long, Long, String, Double)]
    val counts = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long)]
    (0 until NB).foreach { i =>
      val rows = batchRows(i)
      EventMartStream.processBatch(frame(rows), i.toLong, dir, retention)
      consumed ++= rows
      counts += ((i, stateCount(dir, "trans_state"),
        stateCount(dir, "sess_state"),
        Sinks.readCombined(spark, s"$dir/decay_weeks").count()))
      // mid-stream ONLINE REBUCKET (r10 task #2's soak step): widen two
      // state tables' layouts while the stream keeps running — every
      // later batch must resolve the new count from the manifest and
      // every mart must stay exact across the swap
      if (i == NB / 2) {
        Sinks.rebucket(spark, s"$dir/decay_weeks",
          Seq("user_id", "__w"), newN = 128)
        Sinks.rebucket(spark, s"$dir/sess_state", Seq("user_id"), newN = 16)
        assertMartsEqual(dir, consumed, s"right after the mid-stream rebucket")
      }
      // full-history equality at periodic checkpoints + the last batch
      if (i % 8 == 0 || i == NB - 1)
        assertMartsEqual(dir, consumed, s"after batch $i")
    }
    val totalUsers = (NB + 1) * U // steps 0..NB
    val totalUserWeeks = consumed.map(r => (r._1, r._2 / WeekUs)).distinct.size
    val (_, transEnd, sessEnd, decayEnd) = counts.last

    // TTL plateau: only users active within ~2 batch periods survive —
    // steps i-2..i at most (3 steps × U users), far below the 100+ users
    // ever seen. Bound loosely at 5 steps' worth.
    assert(transEnd <= 5L * U,
      s"trans_state must plateau (got $transEnd rows of $totalUsers users)")
    assert(sessEnd <= 5L * U,
      s"sess_state must plateau (got $sessEnd rows of $totalUsers users)")
    // decay plateau: only weeks inside the 63-week window stay live as
    // REAL rows (~16 batches' worth); retired weeks collapse to ONE
    // sentinel row per user inside the same table
    val wkEnd = Sinks.readCombined(spark, s"$dir/decay_weeks")
    val realEnd = wkEnd.filter(col("__w") =!= -1L).count()
    val sentinels = wkEnd.filter(col("__w") === -1L).count()
    assert(realEnd < totalUserWeeks * 2 / 3,
      s"decay_weeks must retire old weeks (got $realEnd real rows of " +
        s"$totalUserWeeks user-weeks ever)")
    assert(sentinels > 0, "the retired weeks must have folded into sentinels")
    assert(decayEnd < totalUserWeeks,
      s"the table as a whole must shrink (got $decayEnd rows)")
    // plateau, not just "smaller": the last quarter's max state size is
    // no bigger than the steady state reached by mid-run
    val steady = counts.slice(NB / 2, NB * 3 / 4)
    val tail = counts.drop(NB * 3 / 4)
    assert(tail.map(_._2).max <= steady.map(_._2).max,
      "trans_state keeps growing in the tail")
    assert(tail.map(_._3).max <= steady.map(_._3).max,
      "sess_state keeps growing in the tail")
  }

  test("a crash at any retention stage replays to the exact batch answer, with a live reader loop") {
    // drive to a batch where ALL retention arms fire (decay sweep with
    // expired weeks needs refW ≥ 63 → batch ≥ 16; TTLs fire from batch
    // 2), then inject a crash at every mutation stage of a fresh batch
    // and replay. Stages: 7 main + 1 decay migrate + 2 sess (fold,
    // delete) + 1 trans delete = 11.
    val dir = Files.createTempDirectory("mart-ret-crash").toString
    val warm = 18
    var consumed = Seq.empty[(Long, Long, Long, String, Double)]
    (0 until warm).foreach { i =>
      val rows = batchRows(i)
      EventMartStream.processBatch(frame(rows), i.toLong, dir, retention)
      consumed ++= rows
    }

    // TWO-DRIVER serving (r11 verdict task #6): a concurrent READER
    // polls the serving views the whole time the crash-injected
    // batches and their replays run — plan-execute gap fuzzing against
    // live commits. Every poll must see a CONSISTENT generation: the
    // views' total event count always equals SOME batch boundary's
    // cumulative count (the session pair's total is invariant under
    // the TTL fold, so a torn fold view — the double count — is a
    // total that matches NO boundary), and no poll may fail loudly
    // (pinned manifests and grace files must outlive every writer
    // commit the poll races).
    val validTotals = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    validTotals.add(consumed.size.toLong)
    val readerErr =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val polls = new java.util.concurrent.atomic.AtomicInteger()
    @volatile var done = false
    val reader = new Thread(() => {
      while (!done && readerErr.get == null) {
        try {
          val t1 = EventMartStream.sessionPaths(spark, dir)
            .agg(sum(col("n_events"))).head.getLong(0)
          require(validTotals.contains(t1),
            s"sessionPaths total $t1 matches no consistent generation")
          val t2 = EventMartStream.decayScores(spark, dir)
            .agg(sum(col("n_events"))).head.getLong(0)
          require(validTotals.contains(t2),
            s"decayScores total $t2 matches no consistent generation")
          polls.incrementAndGet()
        } catch { case t: Throwable => readerErr.set(t) }
      }
    }, "mart-soak-reader")
    reader.start()

    // a replayed batch has no pending retention work (its folds are
    // stamped, its deletes done), so each stage injection gets a FRESH
    // batch — past batch 18 every retention arm fires every batch (4
    // new weeks cross the decay horizon, one rotation step's users
    // cross both TTLs), so all 11 stages exist in every batch
    try (0 until 11).foreach { s =>
      val i = warm + s
      val rows = batchRows(i)
      // the post-batch total becomes a legal reader observation the
      // moment the batch starts mutating — register it FIRST
      validTotals.add((consumed.size + rows.size).toLong)
      EventMartStream.crashAfterStage = s
      val crashed =
        try {
          EventMartStream.processBatch(frame(rows), i.toLong, dir, retention)
          false
        } catch { case _: IllegalStateException => true }
        finally EventMartStream.crashAfterStage = Int.MaxValue
      assert(crashed, s"stage $s never ran — the injection tested nothing")
      // ANY-POINT consistency (the r10 verdict's task #1, wired into
      // the soak): even at the crash instant — including mid-pair,
      // where the per-table session heads disagree — sessionPaths
      // resolves the GROUP's last consistent generation, which is the
      // exact batch recompute over either the pre-batch or the
      // post-batch event history, never a torn mix
      val atCrash = rowsOf(EventMartStream.sessionPaths(spark, dir))
      val preB = rowsOf(CoreQueries.sessionPathsFrom(frame(consumed)))
      val postB = rowsOf(CoreQueries.sessionPathsFrom(frame(consumed ++ rows)))
      assert(atCrash == preB || atCrash == postB,
        s"crash at stage $s: sessionPaths is a torn cross-table mix")
      // the streaming replay: same content, same batch id, no injection
      EventMartStream.processBatch(frame(rows), i.toLong, dir, retention)
      consumed ++= rows
      assertMartsEqual(dir, consumed, s"crash at stage $s")
      assert(readerErr.get == null,
        s"reader failed during stage $s: ${readerErr.get}")
    } finally {
      done = true
      reader.join(120000)
    }
    assert(readerErr.get == null, s"reader failed: ${readerErr.get}")
    assert(polls.get >= 20,
      s"reader loop barely ran (${polls.get} polls) — nothing was fuzzed")
  }
}
