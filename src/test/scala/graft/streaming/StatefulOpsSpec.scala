package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.DedupOps

/** Correctness gate for the streaming layer: each stateful operator's
  * streamed output must equal its batch twin on the same fixture (the
  * driver's DuckDB oracle cannot see streams, so this spec is the gate). */
case class Ev(user: Long, seq: Long, day: String, v: Double)
case class Fe(user: Long, us: Long, eid: Long, code: Int)
case class Te(user: Long, us: Long, eid: Long, et: String)
case class De(user: Long, fp: Long, week: Long)

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  // Fixture: two users across three days, multiple events per day,
  // delivered across THREE micro-batches to exercise state persistence.
  private val batch1 = Seq(
    Ev(1, 1, "2024-01-01", 1.0), Ev(1, 2, "2024-01-01", 2.0),
    Ev(2, 3, "2024-01-01", 3.0))
  private val batch2 = Seq(
    Ev(1, 4, "2024-01-02", 4.0), Ev(2, 5, "2024-01-01", 5.0))
  private val batch3 = Seq(
    Ev(2, 6, "2024-01-03", 6.0), Ev(1, 7, "2024-01-02", 7.0))
  private val all = batch1 ++ batch2 ++ batch3

  /** Run `op` over the fixture delivered in 3 micro-batches; collect. */
  private def streamed[U: org.apache.spark.sql.Encoder](
      name: String, mode: OutputMode)(
      op: org.apache.spark.sql.Dataset[Ev] => org.apache.spark.sql.Dataset[U]): Seq[U] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = op(mem.toDS()).writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try {
      Seq(batch1, batch2, batch3).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[U].collect().toSeq
  }

  test("keepFirst stream == first-arrival per key") {
    val got = streamed("kf", OutputMode.Append()) { ds =>
      StatefulOps.keepFirst[Long, Ev](ds, _.user)
    }
    // arrival order == seq order here, so first arrival per user:
    assert(got.toSet == Set(all.find(_.user == 1).get, all.find(_.user == 2).get))
  }

  test("firstPerPeriod stream == batch keep-first per (user, day)") {
    val got = streamed("fpp", OutputMode.Append()) { ds =>
      StatefulOps.firstPerPeriod[Long, Ev](ds, _.user, _.day, _.seq)
    }
    val batch = DedupOps.keepFirst(all.toDF(),
      Seq(col("user"), col("day")), Seq(col("seq"))).as[Ev].collect()
    assert(got.toSet == batch.toSet)
  }

  test("isNewRepair stream: flag 1 only on first-seen day") {
    val got = streamed("inr", OutputMode.Append()) { ds =>
      StatefulOps.isNewRepair[Long, Ev](ds, _.user, _.day, _.seq)
    }
    val expected = {
      val firstDay = all.groupBy(_.user).map { case (u, evs) =>
        u -> evs.minBy(_.seq).day
      }
      all.map(e => (e, if (e.day == firstDay(e.user)) 1 else 0))
    }
    assert(got.toSet == expected.toSet)
  }

  test("capPerKey stream == batch cap across micro-batches (U7)") {
    val got = streamed("cap", OutputMode.Append()) { ds =>
      StatefulOps.capPerKey[Long, Ev](ds, _.user, _.seq, cap = 2)
    }
    val batch = DedupOps.capPerKey(all.toDF(),
      Seq(col("user")), Seq(col("seq")), cap = 2).as[Ev].collect()
    // user 1 has 2 events in batch1 alone (cap hit immediately); user 2's
    // cap spans batches — the counter must persist across them
    assert(got.toSet == batch.toSet)
    assert(got.count(_.user == 1) == 2 && got.count(_.user == 2) == 2)
  }

  test("temporalEnrich stream == batch asofJoin when arrival order == event order (J3/J8)") {
    // reuse Ev: v < 0 marks a VERSION update, v >= 0 a fact; key = user
    val vb1 = Seq(Ev(1, 1, "d", -10.0), Ev(1, 2, "d", 1.0)) // version then fact
    val vb2 = Seq(Ev(1, 3, "d", -20.0), Ev(2, 4, "d", 2.0)) // u2 fact, NO version yet
    val vb3 = Seq(Ev(1, 5, "d", 3.0), Ev(1, 6, "d", -30.0)) // fact BEFORE next version
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StatefulOps.temporalEnrich[Long, Ev](
        mem.toDS(), _.user, _.seq, _.v < 0)
      .map { case (f, ver) => (f.seq, ver.map(_.v).getOrElse(0.0)) }
      .writeStream.format("memory").queryName("tenr")
      .outputMode(OutputMode.Append()).start()
    try {
      Seq(vb1, vb2, vb3).foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("tenr").as[(Long, Double)].collect().toSet
    // fact 2 sees -10 (same-batch version before it); fact 4 has no
    // version for user 2; fact 5 sees -20, NOT the later -30
    val expected = Set((2L, -10.0), (4L, 0.0), (5L, -20.0))
    assert(got == expected)
    // batch twin: asofJoin over the same rows by seq as "time"
    import graft.operators.JoinOps
    val all = (vb1 ++ vb2 ++ vb3).toDF()
    val facts = all.filter(col("v") >= 0)
      .select(col("user"), col("seq"), col("v"))
    val vers = all.filter(col("v") < 0)
      .select(col("user").as("vu"), col("seq").as("vseq"), col("v").as("vv"))
    val batch = JoinOps.asofJoin(facts, vers,
        col("user"), col("vu"), col("seq"), col("vseq"), Seq("vv"))
      .select(col("seq"), coalesce(col("vv"), lit(0.0)))
      .as[(Long, Double)].collect().toSet
    assert(batch == expected)
  }

  test("keepLastUpdates emits each touched key's latest per batch; final state == batch keep-last") {
    val got = streamed("klu", OutputMode.Update()) { ds =>
      StatefulOps.keepLastUpdates[Long, Ev](ds, _.user, _.seq)
    }
    // Update-mode memory sink appends each batch's emissions; the LAST
    // emission per key must equal the batch keep-last.
    val finalPerKey = got.groupBy(_.user).map { case (_, evs) => evs.maxBy(_.seq) }.toSet
    val batch = DedupOps.keepLast(all.toDF(), Seq(col("user")), Seq(col("seq")))
      .as[Ev].collect().toSet
    assert(finalPerKey == batch)
    // and per-batch emission count: one per touched key per batch
    assert(got.size == 6) // b1: u1,u2; b2: u1,u2; b3: u2,u1
  }

  test("funnelStage stream == the batch a15 state machine on real events") {
    // the REAL sf0.001 events, streamed in three chronological chunks
    // (global ts order ⇒ per-key event-time is non-decreasing across
    // batches — the operator's documented delivery contract)
    val rows = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => Fe(r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"),
        r.getAs[String]("event_type") match {
          case "view" => 1; case "click" => 2; case _ => 3
        }))
      .sortBy(e => (e.us, e.eid))
    val windowMs = 3L * 86400000L
    val chunks = rows.grouped((rows.length + 2) / 3).toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Fe]
    val q = StatefulOps.funnelStage[Long, Fe](mem.toDS(), _.user,
        _.code, e => (e.us, e.eid), windowMs)
      .toDF("user", "stage", "t_ms")
      .writeStream.format("memory").queryName("fnl")
      .outputMode(OutputMode.Append()).start()
    try chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("fnl").as[(Long, Int, Long)].collect()
    // per user: stages advance 1,2,..,max with no repeats
    val gotStage = got.groupBy(_._1).map { case (u, es) =>
      val stages = es.map(_._2).sorted.toSeq
      assert(stages == (1 to stages.max), s"user $u emitted $stages")
      u -> stages.max
    }
    // driver-side reference == the batch a15 fold
    val ref = rows.groupBy(_.user).map { case (u, es) =>
      var c = 0; var t0 = 0L
      es.sortBy(e => (e.us, e.eid)).foreach { e =>
        val tMs = Math.floorDiv(e.us, 1000L)
        if (c == 0 && e.code == 1) { c = 1; t0 = tMs }
        else if (c == 1 && e.code == 2 && tMs - t0 <= windowMs) c = 2
        else if (c == 2 && e.code == 3 && tMs - t0 <= windowMs) c = 3
      }
      u -> c
    }
    assert(gotStage == ref.filter(_._2 >= 1))
    assert(ref.count(_._2 == 0) == ref.size - gotStage.size)
  }

  test("transitionPairs stream-aggregated == the batch a19 transition matrix") {
    // REAL sf0.001 events (all five types), streamed in three
    // chronological chunks — per-key event-time non-decreasing across
    // batches, the operator's documented delivery contract
    val sf = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => Te(r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .sortBy(e => (e.us, e.eid))
    val chunks = rows.grouped((rows.length + 2) / 3).toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Te]
    val q = StatefulOps.transitionPairs[Long, Te](mem.toDS(), _.user,
        _.et, e => (e.us, e.eid))
      .toDF("user", "prev_type", "curr_type")
      .writeStream.format("memory").queryName("trn")
      .outputMode(OutputMode.Append()).start()
    try chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("trn")
      .groupBy("prev_type", "curr_type").count()
      .as[(String, String, Long)].collect()
      .map { case (p, c, n) => (p, c) -> n }.toMap
    val batch = graft.SparkEntry.queries("a19_event_transitions")(spark, sf)
      .as[(String, String, Long)].collect()
      .map { case (p, c, n) => (p, c) -> n }.toMap
    assert(got == batch)
  }

  test("decayScore final emissions == the batch a26 scores, exactly") {
    // REAL sf0.001 events in three chronological chunks; the reference
    // week parameter = the data's max week, i.e. exactly what batch a26
    // derives — so the twin must reproduce its integer scores verbatim
    val sf = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"),
        floor(col("value") * lit(1048576L)).cast("long").as("fp"),
        expr("(unix_millis(ts) div 86400000) div 7").as("week"))
      .collect()
      .map(r => De(r.getAs[Long]("user_id"), r.getAs[Long]("fp"),
        r.getAs[Long]("week")))
      .sortBy(_.week)
    val refWeek = rows.map(_.week).max
    val chunks = rows.grouped((rows.length + 2) / 3).toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[De]
    val q = StatefulOps.decayScore[Long, De](mem.toDS(), _.user,
        _.fp, _.week, refWeek)
      .toDF("user", "n", "score_fp")
      .writeStream.format("memory").queryName("dcy")
      .outputMode(OutputMode.Append()).start()
    try chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
    finally q.stop()
    // a key's LAST emission subsumes the earlier ones: highest n wins
    val got = spark.table("dcy").as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (u, es) =>
        val last = es.maxBy(_._2); u -> (last._2, last._3)
      }
    val batch = graft.SparkEntry.queries("a26_decay_score")(spark, sf)
      .select("user_id", "n_events", "decayed_fp20")
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, s) => u -> (n, s) }.toMap
    assert(got == batch)
  }
}
