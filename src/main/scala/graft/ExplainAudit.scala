package graft

/** Dev utility: print the formatted physical plan of registered queries —
  * `runMain graft.ExplainAudit [queryName ...]` (default: a scale-critical
  * subset). Used to audit scan pruning / pushdown / join strategy /
  * codegen coverage after every operator change. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_scan_project", "x1_split_route", "j6_dim_chain",
        "j4_interval_join", "v2_ann_lsh", "d3_minhash_neardup")
    val spark = GraftSession.local("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").explain("formatted")
    }
    spark.stop()
  }
}
