package graft

/** Dev utility: time one registered query N times (default 3) —
  * `runMain graft.BenchOne <queryName> [sfDir] [n]`. First run includes
  * scan warm-up; later runs isolate compute. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local("graft-bench-one")
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[bench1] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
