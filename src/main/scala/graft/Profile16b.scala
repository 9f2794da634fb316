package graft

import org.apache.spark.sql.functions._

/** Dev utility: g1 phase attribution for round 16 — times the edge
  * cache build, the init jobs, and each checkpointed iteration pair
  * separately so the remaining wall is attributable before any further
  * change. `runMain graft.Profile16b [sfDir]`. */
object Profile16b {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local("graft-profile16b")
    import graft.sources.Tables
    Tables.warm(s, d)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p16b] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val PrScale = 1000000000000L
    for (pass <- 1 to 2) {
    println(s"[p16b] ---- pass $pass")
    val edges = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cu"),
        (col("l_suppkey") * 2 + 1).as("su"))
      .select(explode(array(
        struct(col("cu").as("src"), col("su").as("dst")),
        struct(col("su").as("src"), col("cu").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("src"))
      .groupBy(col("src"), col("dst")).agg(lit(1)).select("src", "dst")
      .withColumn("od", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("edge cache build (count)")(edges.count())
    val nodes = edges.select(col("src").as("node")).distinct()
    val n = time("node count")(nodes.count())
    val teleport = (15L * (PrScale / n)) / 100L
    var sc = time("init checkpoint")(
      nodes.select(col("node"), lit(PrScale / n).as("s")).localCheckpoint(true))
    for (i <- 0 until 10) {
      sc = edges
        .join(sc.withColumnRenamed("node", "__sn").hint("shuffle_hash"),
          col("src") === col("__sn"))
        .select(col("dst"), expr("s div od").as("__c"))
        .groupBy(col("dst").as("node"))
        .agg(expr(s"$teleport + (85 * sum(__c)) div 100").as("s"))
      if (i % 2 == 1 || i == 9)
        sc = time(s"rounds ${i - 1}-$i checkpoint")(sc.localCheckpoint(true))
    }
    time("final orderBy + noop")(
      sc.select((col("node") % 2).cast("int").as("node_type"),
          expr("node div 2").as("key"), col("s").as("score"))
        .orderBy("node_type", "key")
        .write.format("noop").mode("overwrite").save())
    s.catalog.clearCache()
    }
    s.stop()
  }
}
