package graft

/** Dev utility: time one or more registered queries N times (default 3) —
  * `runMain graft.BenchOne <name>[,<name>...] [sfDir] [n]`. First run
  * includes scan warm-up; later runs isolate compute. Passes interleave
  * (q1..qk, q1..qk, …) like graft.Bench so a one-time transient cannot
  * poison one query's median. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val qnames = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local("graft-bench-one")
    graft.sources.Tables.warm(spark, dir)
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (i <- 1 to n; name <- qnames) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      samples(name) = el :: samples(name)
      println(f"[bench1] $name run$i $el%.2f s")
    }
    for (name <- qnames) {
      val s = samples(name).sorted
      println(f"[bench1] $name median ${s(s.length / 2)}%.2f min ${s.head}%.2f")
    }
    spark.stop()
  }
}
