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

  test("z-order clusters BOTH columns; single-column sort only one") {
    import org.apache.spark.sql.DataFrame
    val src = Tables.events(spark, sf).select("event_id", "user_id", "value")

    // per-file fraction of files whose [min,max] intersects a narrow
    // range predicate on `c` — the file-level model of parquet min/max
    // row-group skipping (fewer intersecting files = more skipping)
    def hitFraction(dir: String, c: String): Double = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(stats.length > 4, s"need several files, got ${stats.length}")
      val domain = stats.map(_._1).min to stats.map(_._2).max
      val (qLo, qHi) = (domain.head + domain.size / 2,
        domain.head + domain.size / 2 + domain.size / 20) // a 5% slice
      stats.count { case (lo, hi) => lo <= qHi && hi >= qLo }.toDouble / stats.length
    }

    val zDir = Files.createTempDirectory("graft-z").toString
    Layout.writeZOrdered(src, "event_id", "user_id", zDir, numFiles = Some(16))
    val sDir = Files.createTempDirectory("graft-s").toString
    src.repartitionByRange(16, col("event_id"))
      .sortWithinPartitions(col("event_id"))
      .write.mode("overwrite").parquet(sDir)

    // row multiset unchanged by the rewrite
    assert(spark.read.parquet(zDir).count() == src.count())
    assert(spark.read.parquet(zDir).agg(sum(col("event_id")), sum(col("user_id")))
      .head.toSeq == src.agg(sum(col("event_id")), sum(col("user_id"))).head.toSeq)

    // the sorted layout prunes its sort column but NOT the other one
    assert(hitFraction(sDir, "event_id") < 0.5)
    assert(hitFraction(sDir, "user_id") > 0.9,
      "control: single-sort files should all span the user_id domain")
    // the z-ordered layout prunes on EITHER column
    val (zA, zB) = (hitFraction(zDir, "event_id"), hitFraction(zDir, "user_id"))
    assert(zA < 0.6, s"z-order event_id hit fraction $zA")
    assert(zB < 0.6, s"z-order user_id hit fraction $zB")
  }
}
