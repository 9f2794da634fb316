package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located joins via bucketing: both sides bucketed by the join key
  * into the same bucket count read back as tables join with NO shuffle
  * exchange — the pre-partitioning strategy for repeated large-table
  * joins at 100 TB (pay the shuffle once at write time, never again). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without a shuffle") {
    val whA = Files.createTempDirectory("bucketA").toString
    val whB = Files.createTempDirectory("bucketB").toString
    val facts = (1L to 10000L).map(i => (i % 97, i, i * 2.0)).toDF("k", "id", "v")
    val dims = (0L until 97L).map(i => (i, s"dim$i")).toDF("k", "name")
    facts.write.bucketBy(8, "k").option("path", whA).saveAsTable("bkt_facts")
    dims.write.bucketBy(8, "k").option("path", whB).saveAsTable("bkt_dims")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }
}
