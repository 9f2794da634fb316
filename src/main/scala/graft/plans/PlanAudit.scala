package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Mechanical scale invariants over a query's PHYSICAL plan — the CI form
  * of PLANS.md's prose claims. A query that passes:
  *
  *   1. contains no `CartesianProductExec` — every cross join must ride a
  *      broadcast (BroadcastNestedLoopJoin against a bounded frame is the
  *      engine's sanctioned shape; a shuffled cartesian at 100 TB is a
  *      non-starter);
  *   2. pushes filters to every parquet scan it filters: a scan carrying
  *      `dataFilters` (post-scan predicates on data columns) must report
  *      non-empty `PushedFilters` — losing pushdown silently turns a
  *      pruned scan into a full read;
  *   3. has no `Exchange SinglePartition` that funnels UNBOUNDED rows:
  *      single-partition exchanges are legal only above a partial
  *      aggregate (global aggregates move one pre-merged row per
  *      upstream partition — bounded by the partition count, not the
  *      data).
  *
  * Traversal descends into AQE wrappers and into each cached relation
  * once (two scans of one `InMemoryRelation` share one underlying plan).
  * Branches hidden behind `LogicalRDD` barriers (localCheckpoint-ed
  * intermediates) are audited where they are BUILT, not here — a
  * checkpoint severs lineage by design.
  */
object PlanAudit {

  def violations(df: DataFrame): Seq[String] =
    violations(df.queryExecution.executedPlan)

  def violations(root: SparkPlan): Seq[String] = {
    val seenCaches = new java.util.IdentityHashMap[AnyRef, AnyRef]()
    def walk(p: SparkPlan): Seq[String] = p.collect {
      // inputPlan predates EnsureRequirements (no exchanges yet);
      // executedPlan == the current physical plan (initial plan before
      // any stage runs), which is the one carrying exchange decisions
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
      case c: InMemoryTableScanExec =>
        if (seenCaches.put(c.relation.cacheBuilder, this) == null)
          walk(c.relation.cachedPlan)
        else Nil
      case _: CartesianProductExec =>
        Seq("CartesianProduct: cross join without a broadcast side")
      case f: FileSourceScanExec
          if f.dataFilters.nonEmpty &&
            f.metadata.get("PushedFilters").forall(_ == "[]") =>
        Seq(s"unpushed filters on scan of ${scanName(f)}: " +
          f.dataFilters.mkString(", ").take(160))
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition && !boundedInput(e.child) =>
        Seq("Exchange SinglePartition over unbounded input " +
          s"(child: ${e.child.getClass.getSimpleName})")
    }.flatten
    walk(root)
  }

  private def scanName(f: FileSourceScanExec): String =
    f.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?")

  /** A single-partition exchange is scale-safe when its input is already
    * reduced to O(partitions) rows: a partial/merge-mode aggregate (the
    * global-agg shape) anywhere below the exchange within its stage. */
  private def boundedInput(child: SparkPlan): Boolean =
    child.collectFirst {
      case a: BaseAggregateExec
          if a.aggregateExpressions.forall(ae =>
            ae.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial ||
            ae.mode == org.apache.spark.sql.catalyst.expressions.aggregate.PartialMerge) => a
    }.isDefined
}
