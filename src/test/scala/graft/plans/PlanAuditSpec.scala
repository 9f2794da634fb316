package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** PLANS.md's scale claims as CI: every registered query must satisfy
  * [[PlanAudit]]'s mechanical invariants (no cartesian product, filters
  * pushed to every filtered scan, no unbounded single-partition
  * exchange), plus the v2 CollapseProject block. The negative tests
  * prove the audit CAN fail — a gate that never fires gates nothing. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries exempt from the pushed-filter rule, each with the reason the
    * unpushed filter is the operator's SEMANTICS, not a regression. A new
    * query that loses pushdown must either fix it or argue its way into
    * this list — that argument is the gate. */
  private val pushdownExempt: Map[String, String] = Map(
    "s3_cdc_extract" -> ("the predicate is over the PARSED CDC envelope " +
      "(from_json of a rendered value) — inherently post-parse; the scan " +
      "itself is full-width by design, the operator under test"))

  test("every registered query satisfies the mechanical plan invariants") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val vs =
        try PlanAudit.violations(fn(spark, sf))
        catch { case e: Throwable =>
          Seq(s"audit construction failed: ${e.getMessage}")
        } finally spark.catalog.clearCache()
      vs.filterNot(v => v.startsWith("unpushed") && pushdownExempt.contains(name))
        .map(v => s"$name — $v")
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  test("the corpus-release frame satisfies the plan invariants too") {
    // the app layer composes many operators into one plan — the place a
    // lost broadcast or an accidental cartesian would actually ship
    val vs = try PlanAudit.violations(
        graft.apps.CorpusReleaseApp.releaseFrame(spark, sf))
      finally spark.catalog.clearCache()
    assert(vs.isEmpty, vs.mkString("\n"))
  }

  test("v2's signature projection survives CollapseProject (alias intact)") {
    // the __sig alias is what keeps the 36 plane dots computed ONCE per
    // row instead of once per band reference (a measured nTables×
    // codegen blowup when inlined) — if CollapseProject ever swallows
    // the projection, the attribute name vanishes from the plan
    val plan = SparkEntry.queries("v2_ann_lsh")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__sig"), "v2 signature alias collapsed away")
  }

  test("negative: a true shuffled cartesian is flagged") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(10).toDF("x")
      val b = spark.range(10).toDF("y")
      val vs = PlanAudit.violations(a.crossJoin(b))
      assert(vs.exists(_.contains("CartesianProduct")), vs.mkString("; "))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("negative: a scan that loses filter pushdown is flagged") {
    // a UDF predicate is the canonical pushdown-loser: untranslatable,
    // so the scan reads every row and filters after the fact
    val f = udf((x: Long) => x > 1)
    val df = spark.read.parquet(s"$sf/region.parquet")
      .filter(f(col("r_regionkey")))
    val vs = PlanAudit.violations(df)
    assert(vs.exists(_.contains("unpushed filters")), vs.mkString("; "))
  }

  test("an optimizer-inferred explode guard is NOT flagged (unpushable by nature)") {
    // InferFiltersFromGenerate wraps the explode in size(...)>0 AND
    // isnotnull(...) over the COMPUTED split — parquet can never
    // evaluate that, so it is not a lost pushdown (rule 2 counts only
    // attribute-level predicates)
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
    assert(PlanAudit.violations(df).isEmpty,
      PlanAudit.violations(df).mkString("; "))
    // ... and the same guard over a PLAIN array-typed parquet column:
    // isnotnull(arrayAttr) is also unpushable (parquet rejects
    // complex-typed predicates), so it must not flag either
    val arr = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(explode(col("embedding")).as("x"))
      .agg(sum(col("x")))
    assert(PlanAudit.violations(arr).isEmpty,
      PlanAudit.violations(arr).mkString("; "))
  }

  test("negative: an unbounded single-partition exchange is flagged") {
    // a global (partitionBy-less) window funnels EVERY row through one
    // partition — the shape the engine bans (u10 windows within buckets
    // for exactly this reason)
    val df = spark.read.parquet(s"$sf/region.parquet")
      .withColumn("rn", row_number().over(Window.orderBy("r_regionkey")))
    val vs = PlanAudit.violations(df)
    assert(vs.exists(_.contains("SinglePartition")), vs.mkString("; "))
  }

  test("a bounded global aggregate is NOT flagged (partial-agg exemption)") {
    val df = spark.read.parquet(s"$sf/region.parquet").agg(count(lit(1)).as("n"))
    assert(PlanAudit.violations(df).isEmpty)
  }

  test("negative: a broadcast() hint on an unbounded frame is flagged") {
    // the audit floors the leaf bound at 10 MB (BroadcastFloorBytes) so
    // session conf alone can't flip the verdict — the unbounded side
    // must be GENUINELY over the floor: sf0.1 lineitem is ~11 MB
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try {
      val big = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      val dim = spark.read.parquet(s"$sf/nation.parquet")
      val df = dim.join(broadcast(big),
        dim("n_nationkey") === big("l_suppkey"))
      val vs = PlanAudit.violations(df)
      assert(vs.exists(_.contains("BroadcastExchange")), vs.mkString("; "))
      // and a cardinality reducer on the same frame un-flags it
      val small = big.limit(25).select(col("l_partkey").as("r_partkey"))
      val ok = big.join(broadcast(small),
        big("l_orderkey") === small("r_partkey"))
      assert(!PlanAudit.violations(ok).exists(_.contains("BroadcastExchange")))
      // but a reducer buried on one side of a fact-sized join does NOT
      // launder the join's own broadcast: boundedness is judged along
      // the output spine, not by any-descendant matching
      val fact2 = spark.read.parquet(s"$sf/orders.parquet")
      val nested = fact2.join(broadcast(ok),
        fact2("o_orderkey") === big("l_orderkey"))
      assert(PlanAudit.violations(nested).exists(_.contains("BroadcastExchange")),
        "fact-sized broadcast with a nested limit sailed through")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("broadcast of a small dim passes even with auto-broadcast disabled") {
    // autoBroadcastJoinThreshold = -1 is a common production setting
    // (all broadcasts explicit); without the audit's 10 MB floor every
    // scan leaf would read as unbounded and every legitimate
    // broadcast() hint over a small dim would flag
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dim = spark.read.parquet(s"$sf/nation.parquet")
      val fact = spark.read.parquet(s"$sf/customer.parquet")
      val df = fact.join(broadcast(dim),
        fact("c_nationkey") === dim("n_nationkey"))
      val vs = PlanAudit.violations(df)
      assert(!vs.exists(_.contains("BroadcastExchange")), vs.mkString("; "))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
