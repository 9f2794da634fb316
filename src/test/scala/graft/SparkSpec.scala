package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (getOrCreate ⇒ one JVM-wide session;
  * small core count keeps per-suite overhead low). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Collect matching nodes from a physical plan, descending through
    * the AQE wrappers (`AdaptiveSparkPlanExec`, `QueryStageExec`) that
    * a plain `plan.collect` treats as leaves — the one shared walker
    * for every structural plan assertion (scans, broadcasts, local
    * relations); a per-spec copy that misses a wrapper silently walks
    * an empty subtree and turns its assertion vacuous. */
  def collectPlan[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil
    val below = p match {
      case a: AdaptiveSparkPlanExec => collectPlan(a.executedPlan)(pf)
      case s: QueryStageExec => collectPlan(s.plan)(pf)
      // ReusedExchange is a LEAF wrapping the shared subtree — without
      // descending, a broadcast/scan count silently misses everything
      // AQE deduplicated
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        collectPlan(r.child)(pf)
      case other => other.children.flatMap(c => collectPlan(c)(pf))
    }
    val subs = p.subqueries.flatMap(sq => collectPlan(sq)(pf))
    here ++ below ++ subs
  }

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
