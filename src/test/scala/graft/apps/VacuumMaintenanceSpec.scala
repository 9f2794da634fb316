package graft.apps

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Vacuum in the maintenance loop (r13 verdict task #6):
  * [[Snapshots.vacuumReport]] runs report-only on the hybrid cycle and
  * the mart's sweep cadence, routing findings to
  * [[Snapshots.onVacuumFindings]]. Pinned:
  *
  *  - a HEALTHY long-run tree reports ZERO findings across every
  *    cycle — the report is not a false-positive machine;
  *  - an injected orphan (a pin whose group dir was rm-rf'd
  *    out-of-band — the r12 forever-leak) is surfaced by the very
  *    next cycle, with the cycle itself unharmed;
  *  - deletion stays manual: the reported orphan survives until an
  *    operator runs `vacuum(delete = true)`. */
class VacuumMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def captureFindings[T](body: => T)
      : (T, Seq[(String, String)]) = {
    val buf = scala.collection.mutable.ListBuffer[(String, String)]()
    val prior = Snapshots.onVacuumFindings
    Snapshots.onVacuumFindings = (_, fs) => buf ++= fs
    try { val r = body; (r, buf.toList) }
    finally Snapshots.onVacuumFindings = prior
  }

  private def injectOrphanPin(table: String): Path = {
    val deadGroup = Files.createTempDirectory("vac-deadgrp").toString
    // a pin with a back-pointer at a group that has no manifest — the
    // state an out-of-band `rm -rf <groupDir>` leaves behind
    val pin = new Path(s"$table/_snap/pin.feedc0de-dead.1")
    val out = fs.create(pin, true)
    try out.write(s"1\nfile:$deadGroup\n".getBytes("UTF-8"))
    finally out.close()
    pin
  }

  private def textOf(id: Long): String =
    s"alpha w${id % 7} w${(id / 7) % 7} common w${id % 5} tail${id % 3}"
  private def docsOf(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, textOf(i))).toDF("doc_id", "text")
  private def vecsOf(ids: Seq[Long]): DataFrame =
    ids.toDF("vec_id").select(col("vec_id"),
      array((0 until 4).map(i =>
        (pmod(col("vec_id") * (7 * i + 3), lit(997)).cast("float") / lit(997f))
          + lit(0.01f)): _*).cast("array<float>").as("embedding"))

  test("hybrid cycles report zero findings on a healthy tree, the injected orphan on the next") {
    val work = Files.createTempDirectory("vac-hybrid").toString
    val (tIdx, vIdx, grp) = (s"$work/text", s"$work/vec", s"$work/grp")
    TextIndexApp.build(spark, docsOf(0L until 60L), tIdx, nBuckets = 8)
    VectorIndexApp.build(spark, vecsOf(0L until 60L), vIdx,
      kCells = 4, iters = 2)
    HybridSearchApp.commitGroup(spark, tIdx, vIdx, grp)
    // three healthy maintenance cycles: append, append, retract
    val (_, healthy) = captureFindings {
      HybridSearchApp.append(spark, docsOf(60L until 80L),
        vecsOf(60L until 80L), tIdx, vIdx, grp)
      HybridSearchApp.append(spark, docsOf(80L until 100L),
        vecsOf(80L until 100L), tIdx, vIdx, grp)
      HybridSearchApp.retractBoth(spark, Seq(3L, 64L), tIdx, vIdx, grp)
    }
    assert(healthy.isEmpty,
      s"a healthy tree reported vacuum findings: $healthy")

    val pin = injectOrphanPin(s"$vIdx/codes")
    val (_, found) = captureFindings {
      HybridSearchApp.append(spark, docsOf(100L until 110L),
        vecsOf(100L until 110L), tIdx, vIdx, grp)
    }
    assert(found.map(_._1) == Seq("orphan-pin"),
      s"the injected orphan was not surfaced (or not alone): $found")
    assert(fs.exists(pin),
      "report-mode maintenance deleted a pin — deletion must stay manual")
    // the operator's deliberate delete collects it
    Snapshots.vacuum(fs, new Path(s"$vIdx/codes"), delete = true)
    assert(!fs.exists(pin))
  }

  test("mart sweep cadence reports zero findings healthy, the injected orphan next sweep") {
    val dir = Files.createTempDirectory("vac-mart").toString
    def events(n: Long, off: Long): DataFrame =
      spark.range(n).select(col("id").as("user_id"),
        timestamp_micros(lit(1700000000000000L) + (col("id") + lit(off)) *
          lit(1000000L)).as("ts"),
        (col("id") + lit(off)).as("event_id"),
        concat(lit("t"), (col("id") % 3).cast("string")).as("event_type"),
        (col("id") % 7).cast("double").as("value"))
    val sweepy = EventMartStream.Retention(decaySweepEveryN = 1,
      ttlSweepEveryN = Int.MaxValue)
    val (_, healthy) = captureFindings {
      (0 until 3).foreach(i => EventMartStream.processBatch(
        events(50, i * 1000L), i.toLong, dir, sweepy))
    }
    assert(healthy.isEmpty,
      s"a healthy mart reported vacuum findings: $healthy")
    val pin = injectOrphanPin(s"$dir/uv_days")
    val (_, found) = captureFindings {
      EventMartStream.processBatch(events(50, 9000L), 3L, dir, sweepy)
    }
    assert(found.map(_._1) == Seq("orphan-pin"), s"not surfaced: $found")
    assert(fs.exists(pin), "report mode must not delete")
  }
}
