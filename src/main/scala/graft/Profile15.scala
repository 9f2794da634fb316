package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the r15 optimization round — times sub-phases of
  * the hottest queries. Deleted/ignored by the driver; not a registered
  * query. */
object Profile15 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local("graft-profile15")
    graft.sources.Tables.warm(s, d)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.sources.Tables
    import graft.operators.SimilarityOps
    val e = Tables.embeddings(s, d)
    println("n_embeddings=" + e.count())
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      val cb = time(s"r$round.v12.coarse_kmeans")(
        SimilarityOps.kmeansCodebook(e, 16, 2))
      cb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pqcb = time(s"r$round.v12.pq_codebook")(
        SimilarityOps.pqCodebook(e, 4, 16, 16, 2))
      val codes = SimilarityOps.ivfPqCodes(e, cb, pqcb, 4, 16, revalidate = false)
      time(s"r$round.v12.codes_noop")(noop(codes))
      val probes = SimilarityOps.ivfPqProbes(e, cb, pqcb, col("vec_id") < 50,
        4, 4, 16, 16, revalidate = false)
      time(s"r$round.v12.probes_noop")(noop(probes))
      val full = SimilarityOps.ivfPqSearchCodes(codes, probes, e,
        col("vec_id") < 50, 4, 16, 5, 100)
      time(s"r$round.v12.search_noop")(noop(full))
      time(s"r$round.v12.full_query")(
        noop(SparkEntry.queries("v12_ann_ivfadc")(s, d)))
      s.catalog.clearCache()
    }
    s.stop()
  }
}
