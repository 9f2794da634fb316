package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FileSourceScanExec, GlobalLimitExec,
  LocalLimitExec, LocalTableScanExec, RangeExec, SparkPlan,
  TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
  ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.apache.spark.sql.internal.SQLConf

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
  *      data);
  *   4. broadcasts only BOUNDED frames: a `BroadcastExchange` whose
  *      subtree contains neither an aggregate, a limit (incl. rank-
  *      window group limits), a literal relation, nor a scan under the
  *      auto-broadcast threshold is a `broadcast()` hint on an
  *      unbounded frame — it ships the data to every executor and OOMs
  *      the driver at scale, and nothing before this rule would catch
  *      it.
  *
  * Traversal descends into AQE wrappers and into each cached relation
  * once (two scans of one `InMemoryRelation` share one underlying plan).
  * Branches hidden behind `LogicalRDD` barriers (localCheckpoint-ed
  * intermediates) are audited where they are BUILT, not here — a
  * checkpoint severs lineage by design.
  */
object PlanAudit {

  /** Floor (bytes) under which a file-scan leaf is always a bounded
    * broadcast side, regardless of `autoBroadcastJoinThreshold` — the
    * session conf can be -1 (auto-broadcast disabled), which would
    * otherwise flip rule 4 to flag every explicit broadcast() over a
    * small dim. 10 MB = Spark's own default threshold. */
  private[plans] val BroadcastFloorBytes: Long = 10L * 1024 * 1024

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
          if pushableDataFilters(f).nonEmpty &&
            f.metadata.get("PushedFilters").forall(_ == "[]") =>
        Seq(s"unpushed filters on scan of ${scanName(f)}: " +
          pushableDataFilters(f).mkString(", ").take(160))
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition && !boundedInput(e.child) =>
        Seq("Exchange SinglePartition over unbounded input " +
          s"(child: ${e.child.getClass.getSimpleName})")
      case b: BroadcastExchangeExec if !boundedBroadcast(b.child) =>
        Seq("BroadcastExchange over an unbounded frame " +
          s"(child: ${b.child.getClass.getSimpleName})")
    }.flatten
    walk(root)
  }

  /** Rule 2 counts only filters that COULD have pushed. The optimizer's
    * own `InferFiltersFromGenerate` wraps every explode in
    * `size(e) > 0 AND isnotnull(e)` — over a computed expression
    * (split/transform chains) OR a plain array-typed column — and
    * parquet's filter converter handles neither (complex-typed columns
    * are never pushable), so their presence is not a LOST pushdown and
    * flagging them would force every explode query onto an exemption
    * list. Predicates over ATOMIC-typed attributes (the class parquet
    * can actually evaluate) still count. */
  private def pushableDataFilters(f: FileSourceScanExec) = {
    import org.apache.spark.sql.catalyst.expressions.{
      Attribute, Expression, GreaterThan, IsNotNull, Literal, Size}
    def atomicAttr(e: Expression): Boolean = e match {
      case a: Attribute => a.dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType => false
        case _ => true
      }
      case _ => false
    }
    f.dataFilters.filterNot {
      case GreaterThan(Size(_, _), Literal(0, _)) => true // size ⇒ complex type
      case IsNotNull(e) => !atomicAttr(e)
      case _ => false
    }
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

  /** A broadcast subtree is bounded when every root-to-leaf SPINE is
    * covered by a cardinality reducer (aggregate, limit, top-k,
    * rank-window group limit) or terminates in a bounded leaf (literal
    * relation, `range`, a file scan under the auto-broadcast
    * threshold). Judged root-downward, NOT by any-descendant matching —
    * a fact-sized join whose small side contains a limit must still be
    * flagged (the reducer bounds that side, not the join's output).
    * Multi-child nodes (joins, unions) are bounded only if ALL inputs
    * are; other nodes inherit from their children; unknown leaves are
    * conservatively unbounded. */
  private def boundedBroadcast(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: GlobalLimitExec | _: LocalLimitExec |
         _: TakeOrderedAndProjectExec | _: WindowGroupLimitExec => true
    case _: LocalTableScanExec | _: RangeExec => true
    case f: FileSourceScanExec =>
      // floor the bound: with autoBroadcastJoinThreshold = -1 (auto-
      // broadcast disabled, a common production setting) every scan
      // leaf would read as unbounded and every legitimate broadcast()
      // hint over a small dim would flag — the audit verdict must
      // depend on the plan's scale, not on an unrelated session conf
      f.relation.location.sizeInBytes <=
        math.max(SQLConf.get.autoBroadcastJoinThreshold, BroadcastFloorBytes)
    case c: InMemoryTableScanExec => boundedBroadcast(c.relation.cachedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      boundedBroadcast(s.plan)
    case a: AdaptiveSparkPlanExec => boundedBroadcast(a.executedPlan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      boundedBroadcast(r.child)
    case other =>
      other.children.nonEmpty && other.children.forall(boundedBroadcast)
  }
}
