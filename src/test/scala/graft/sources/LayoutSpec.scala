package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Layout rewrite invariance + proof that the layout actually prunes:
  * a day filter on the partitioned table must touch a strict subset of
  * partitions at planning time, and pushed filters must reach the scan. */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("partitioned rewrite preserves the row multiset") {
    val out = Files.createTempDirectory("graft-layout").toString
    val src = Tables.events(spark, sf)
    Layout.writePartitionedByDay(src, "ts", "user_id", out)
    val back = Layout.readPartitioned(spark, out)
    val a = src.select(col("event_id"), col("user_id"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .collect().map(_.toSeq).sortBy(_.toString)
    // partition-type inference reads day=yyyy-MM-dd back as DateType;
    // cast to compare against the string derivation
    val b = back.select(col("event_id"), col("user_id"),
      col("day").cast("string").as("day"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.length == b.length && a.sameElements(b))
  }

  test("day filter prunes partitions at planning time; cluster filter is pushed") {
    val out = Files.createTempDirectory("graft-layout2").toString
    Layout.writePartitionedByDay(Tables.events(spark, sf), "ts", "user_id", out)
    val t = Layout.readPartitioned(spark, out)
    val allParts = Layout.scannedPartitions(t)
    assert(allParts > 1, s"fixture must span several days, got $allParts")

    val someDay = t.select(col("day").cast("string")).orderBy("day")
      .head.getString(0)
    val pruned = Layout.scannedPartitions(t.filter(col("day") === someDay))
    assert(pruned == 1, s"expected 1 scanned partition, got $pruned")

    // the cluster-column filter must reach the parquet scan as a pushed
    // filter (row-group skipping), not evaluate post-scan only
    val plan = t.filter(col("user_id") === 42)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,42)]"),
      s"user_id filter not pushed:\n$plan")
  }
}
