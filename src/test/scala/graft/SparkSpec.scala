package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (getOrCreate ⇒ one JVM-wide session;
  * small core count keeps per-suite overhead low). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Job count for `group` once the async status store stops moving:
    * sample, SLEEP, resample until two consecutive samples agree (or
    * the deadline passes). Sampling twice back-to-back exits before
    * the listener bus drains and undercounts. */
  def stableJobCount(group: String, timeoutMs: Long = 5000): Int = {
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var prev = -1
    var cur = tracker.getJobIdsForGroup(group).length
    while (System.nanoTime() < deadline && cur != prev) {
      prev = cur
      Thread.sleep(100)
      cur = tracker.getJobIdsForGroup(group).length
    }
    cur
  }
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local("graft-test", cores = 4)
}
