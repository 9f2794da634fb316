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

  test("rank-scaled z-order keeps pruning selective under skew") {
    // zipf-ish column: b = 20000/(1+k), k uniform in [0,200) — half the
    // rows land in [100, 199], which linear scaling collapses into ONE
    // grid cell (span/64 ≈ 311), smearing the dense region across every
    // curve segment; rank cells hold equal row counts by construction
    val src = spark.range(20000).toDF("id")
      .withColumn("a", col("id"))
      .withColumn("b", (lit(20000.0)
        / (lit(1) + pmod(col("id") * 7919, lit(200)))).cast("long"))
    // the realistic predicate: a narrow RANK window inside the dense region
    val q = src.stat.approxQuantile("b", Array(0.25, 0.28), 0.0)
    val (qLo, qHi) = (q(0), q(1))
    def hitFiles(dir: String): Int =
      spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
        .count { case (lo, hi) => lo <= qHi && hi >= qLo }

    val lin = Files.createTempDirectory("graft-zlin").toString
    Layout.writeZOrdered(src, "a", "b", lin, bits = 6, numFiles = Some(16))
    val rnk = Files.createTempDirectory("graft-zrnk").toString
    Layout.writeZOrdered(src, "a", "b", rnk, bits = 6, numFiles = Some(16),
      rankScaled = true)

    // layout rewrite invariance holds in rank mode too
    assert(spark.read.parquet(rnk).agg(count(lit(1)), sum(col("a")), sum(col("b")))
      .head.toSeq == src.agg(count(lit(1)), sum(col("a")), sum(col("b"))).head.toSeq)

    val (hl, hr) = (hitFiles(lin), hitFiles(rnk))
    assert(hr * 2 <= hl,
      s"rank-scaled hit $hr of 16 files vs linear $hl — expected >= 2x better")
  }

  test("rank-scaled z-order works under the DEFAULT bits (clamped, not thrown)") {
    // writeZOrdered(rankScaled = true) with the default bits = 16 used
    // to throw (the rank cap was a require) — an API footgun: the flag
    // was unusable without also knowing to override a default. Rank
    // mode now clamps to its 8-bit grid instead.
    val src = spark.range(2000).toDF("id")
      .withColumn("a", col("id"))
      .withColumn("b", pmod(col("id") * 7919, lit(500)))
    val dir = Files.createTempDirectory("graft-zdef").toString
    Layout.writeZOrdered(src, "a", "b", dir, numFiles = Some(8),
      rankScaled = true) // bits left at its default
    assert(spark.read.parquet(dir).agg(count(lit(1)), sum(col("a")), sum(col("b")))
      .head.toSeq == src.agg(count(lit(1)), sum(col("a")), sum(col("b"))).head.toSeq)
  }

  test("z-order survives huge column spans (no multiply overflow)") {
    // span ≈ 2^52 — the old (v-lo)·2^bits form overflowed Long above
    // 2^47 and silently scrambled the curve (every file then spans the
    // whole domain and nothing prunes)
    val src = spark.range(4096).toDF("id")
      .withColumn("a", col("id") * lit(1L << 40))
      .withColumn("b", pmod(col("id") * lit(2654435761L), lit(4096)))
    val dir = Files.createTempDirectory("graft-zbig").toString
    Layout.writeZOrdered(src, "a", "b", dir, bits = 16, numFiles = Some(16))
    assert(spark.read.parquet(dir).agg(count(lit(1)), sum(col("a")))
      .head.toSeq == src.agg(count(lit(1)), sum(col("a"))).head.toSeq)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(min(col("a")).as("lo"), max(col("a")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val domain = (stats.map(_._1).min, stats.map(_._2).max)
    val mid = domain._1 + (domain._2 - domain._1) / 2
    val (qLo, qHi) = (mid, mid + (domain._2 - domain._1) / 20)
    val frac = stats.count { case (lo, hi) => lo <= qHi && hi >= qLo }
      .toDouble / stats.length
    assert(frac < 0.5, s"a-slice hit fraction $frac — curve scrambled?")
  }
}
