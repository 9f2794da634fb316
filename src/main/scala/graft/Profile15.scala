package graft

import org.apache.spark.sql.functions._

/** Scratch profiler/plan-dumper for the r15 optimization round. The
  * iterative queries (g1, d6) run their loops EAGERLY at construction,
  * so their registered-query explain shows only the tail — this dumps
  * the PER-ITERATION plan in both the r14 shape (sort-merge join over
  * the cached edges) and the r15 shape (shuffled-hash, sort-free) to
  * `plans/r15/g1_iteration_{before,after}.txt`. Not a registered query;
  * ignored by the driver. */
object Profile15 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local("graft-profile15")
    import graft.sources.Tables
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      out.toString
    }
    // r14 shape: pairs cache + edgesW cache, plain join (SMJ)
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cu"), (col("l_suppkey") * 2 + 1).as("su"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges0 = pairs.select(col("cu").as("src"), col("su").as("dst"))
      .unionByName(pairs.select(col("su").as("src"), col("cu").as("dst")))
    val odf0 = edges0.groupBy(col("src").as("node")).agg(count(lit(1)).as("od"))
    val edgesW = edges0.join(odf0, col("src") === col("node"))
      .select(col("src"), col("dst"), col("od"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edgesW.count()
    val sc0 = odf0.select(col("node"), lit(1L).as("s")).localCheckpoint(true)
    val iterBefore = edgesW
      .join(sc0.withColumnRenamed("node", "__sn"), col("src") === col("__sn"))
      .select(col("dst"), expr("s div od").as("__c"))
      .groupBy(col("dst").as("node"))
      .agg(expr("1 + (85 * sum(__c)) div 100").as("s"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r15/g1_iteration_before.txt"),
      "g1 PER-ITERATION plan, r14 shape (score side unhinted => sort-merge\n" +
        "join: the cached edge list re-sorts every one of the 10 rounds):\n\n" +
        planOf(iterBefore))
    // r15 shape: one narrow edge cache, od in state, shuffle_hash hint
    val edges = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cu"), (col("l_suppkey") * 2 + 1).as("su"))
      .select(explode(array(
        struct(col("cu").as("src"), col("su").as("dst")),
        struct(col("su").as("src"), col("cu").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("src"))
      .groupBy(col("src"), col("dst")).agg(lit(1)).select("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val odf = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("od"))
      .localCheckpoint(true)
    val sc1 = odf.select(col("node"), lit(1L).as("s"), col("od"))
      .localCheckpoint(true)
    val iterAfter = edges
      .join(sc1.withColumnRenamed("node", "__sn").hint("shuffle_hash"),
        col("src") === col("__sn"))
      .select(col("dst"), expr("s div od").as("__c"))
      .groupBy(col("dst").as("node"))
      .agg(expr("1 + (85 * sum(__c)) div 100").as("s"))
      .join(odf.select(col("node"), col("od")).hint("shuffle_hash"), "node")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r15/g1_iteration_after.txt"),
      "g1 PER-ITERATION plan, r15 shape (shuffle_hash on the score side:\n" +
        "cached edges stream sort-free; od restored by shuffled-hash join):\n\n" +
        planOf(iterAfter))
    println("[prof] iteration plans written")
    s.stop()
  }
}
