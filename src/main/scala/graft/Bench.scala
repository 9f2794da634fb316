package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    // Warm-up: touch every table once (OS page cache + codegen JIT) so
    // per-query timings measure compute, not which query ran first.
    graft.sources.Tables.all.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // (name, seconds, error) — a failed query is REPORTED, never silently
    // timed as near-zero success.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes every output column (count() would let
      // Catalyst prune computed columns and understate the work)
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // cache teardown (per-query persists must not leak) happens OUTSIDE
      // the timed window — it is harness hygiene, not query cost
      spark.catalog.clearCache()
      (name, elapsed, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s"\"$k\":${jstr(m)}" }
      .mkString("{", ",", "}")
    val nErr = results.count(_._3.isDefined)
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_errors":$nErr,"sf":"$sfDir"}""")
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
