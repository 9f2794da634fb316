package graft

/** Dev utility: count the Spark JOBS a registered query issues and time
  * it warm — the r15 verdict's s3/t11/t14 audit (is the cost many
  * actions, or one scan-bound job?). `runMain graft.Profile16c
  * <query>[,<query>...] [sfDir]`. */
object Profile16c {
  def main(args: Array[String]): Unit = {
    val qnames = args(0).split(",").toSeq
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile16c")
    graft.sources.Tables.warm(spark, d)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
      })
    for (pass <- 1 to 3; name <- qnames) {
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(200) // let listener events drain before reading
      println(f"[p16c] $name pass$pass $el%.2f s jobs=${jobs.get} stages=${stages.get}")
    }
    spark.stop()
  }
}
