package graft

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.apps.{TextIndexApp, VectorIndexApp}
import graft.sources.Tables

/** The 10× scaling probe (r9 verdict task #1): measure the wall-time
  * SLOPE of the most expensive queries between sf0.1 and a synthesized
  * 10× corpus, converting the per-round "scale-safe by plan reading"
  * grades into data — a superlinear slope is a hidden scale-killer no
  * single-scale bench can see.
  *
  * `runMain graft.ScaleProbe <srcDir> <destDir>` — synthesizes
  * `destDir` from `srcDir` if missing (10 id-shifted copies; testdata
  * itself is read-only), runs the probe queries at both scales
  * (2 passes each, MIN per scale — the quiet-machine cost; ratios of
  * medians would fold ambient noise into the slope), runs one
  * build + append + query cycle per persistent index at both scales,
  * and prints a slope table plus one JSON line.
  *
  * Corpus synthesis keeps the 10× honest (≈ ten independent sf0.1
  * populations, not ten byte-copies):
  *  - ids shift by k·10⁸ per copy with referential integrity
  *    (orders.o_orderkey ↔ lineitem.l_orderkey, orders.o_custkey ↔
  *    customer.c_custkey, documents.doc_id ↔ embeddings.vec_id share
  *    one offset — v13 fuses them by id);
  *  - document TEXT gets a per-copy token suffix, making cross-copy
  *    vocabulary disjoint — near-dup structure and df distributions
  *    scale like independent corpora instead of every doc acquiring
  *    ten exact clones (which would overstate the d-family's group
  *    quadratics);
  *  - embeddings jitter by +k·0.0013 per dimension so copies are not
  *    identical points (ANN candidate sets scale, not degenerate). */
object ScaleProbe {

  private val Off = 100000000L // > every id in sf0.1 by two orders

  /** The probe set: the round-9 verdict's 12 most expensive queries. */
  private val ProbeQueries = Seq(
    "g1_pagerank", "v12_ann_ivfadc", "v10_ann_pq", "d11_best_neardup",
    "d7_simhash_hamming", "d6_dedup_clusters", "t15_bm25_search",
    "x2_log_explode", "c1_clean_corpus", "v13_hybrid_rrf",
    "s3_cdc_extract", "q3_top_revenue")

  def main(args: Array[String]): Unit = {
    val Array(srcDir, destDir) = args.take(2)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local("graft-scale-probe")
    try {
      val fs = new Path(destDir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(s"$destDir/_GENERATED"))) {
        gen(spark, srcDir, destDir, factor)
        fs.create(new Path(s"$destDir/_GENERATED"), true).close()
      }
      // warm both scales' page cache the way Bench does, so the first
      // timed query is not a disk-fill artifact
      Seq(srcDir, destDir).foreach(d => Tables.warm(spark, d))
      val t1 = runQueries(spark, srcDir)
      val t10 = runQueries(spark, destDir)
      val i1 = indexCycle(spark, srcDir, destDir + "-idx1")
      val i10 = indexCycle(spark, destDir, destDir + "-idx10")
      report(t1, t10, i1, i10)
    } finally spark.stop()
  }

  // -------------------------------------------------------------- generate

  private def gen(spark: SparkSession, src: String, dst: String,
                  factor: Int): Unit = {
    def copyAsIs(t: String): Unit =
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    Seq("region", "nation", "supplier", "part").foreach(copyAsIs)

    def widen(t: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      (0 until factor).map(k => shift(base, k))
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scale-probe] generated $dst/$t.parquet (x$factor)")
    }
    widen("customer") { (df, k) =>
      df.withColumn("c_custkey", col("c_custkey") + k * Off) }
    widen("orders") { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + k * Off)
        .withColumn("o_custkey", col("o_custkey") + k * Off) }
    widen("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + k * Off)
        .withColumn("l_suppkey", col("l_suppkey") + k * Off) }
    widen("events") { (df, k) =>
      df.withColumn("event_id", col("event_id") + k * Off)
        .withColumn("user_id", col("user_id") + k * Off) }
    widen("documents") { (df, k) =>
      val shifted = df.withColumn("doc_id", col("doc_id") + k * Off)
      if (k == 0) shifted
      else shifted.withColumn("text",
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"x$k"))), " ")) }
    widen("embeddings") { (df, k) =>
      df.withColumn("vec_id", col("vec_id") + k * Off)
        .withColumn("embedding",
          transform(col("embedding"),
            x => (x + lit(k * 0.0013f)).cast("float"))) }
  }

  // ------------------------------------------------------------------ time

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def runQueries(spark: SparkSession, dir: String)
      : Map[String, Double] = {
    val qs = SparkEntry.queries
    // two temporally-separated passes, MIN per query (transient-immune)
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to 2; name <- ProbeQueries) {
      // failure-tolerant like Verify: one blown query (a guard sized
      // for the organic corpus, say) must not kill the whole probe
      try {
        val t = time {
          qs(name)(spark, dir).write.format("noop").mode("overwrite").save()
        }
        samples(name) = t :: samples(name)
        println(f"[scale-probe] $dir $name%-20s ${t}%8.2f s")
      } catch { case e: Throwable =>
        println(s"[scale-probe] $dir $name FAILED: " +
          Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      } finally spark.catalog.clearCache()
    }
    samples.map { case (k, v) => k -> v.min }.toMap
  }

  /** One persistent-index lifecycle per scale: build over the full
    * corpus, append a 2k-row delta, serve one bounded query batch.
    * Geometry (buckets/cells) is FIXED across scales — the serving
    * contract; what must scale is the data behind it. */
  private def indexCycle(spark: SparkSession, dir: String, work: String)
      : Map[String, Double] = {
    val fs = new Path(work).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(work), true)
    val docs = Tables.documents(spark, dir)
    val vecs = Tables.embeddings(spark, dir)
    val maxDoc = docs.agg(max(col("doc_id"))).head.getLong(0)
    val docDelta = docs.filter(col("doc_id") < 2000)
      .withColumn("doc_id", col("doc_id") + maxDoc + 1)
      .withColumn("text", concat(col("text"), lit(" zqdelta")))
      .localCheckpoint(true)
    val vecDelta = vecs.filter(col("vec_id") < 2000)
      .withColumn("vec_id", col("vec_id") + maxDoc + 1)
      .localCheckpoint(true)
    val probes = docs.filter(col("doc_id") < 8)
      .select(col("doc_id").as("q_id"), col("text")).localCheckpoint(true)
    val out = scala.collection.mutable.Map[String, Double]()
    // same failure policy as runQueries: a blown index step at one
    // scale must not discard everything already measured — but a step
    // whose PREREQUISITE failed is skipped, not run: timing an append
    // against a half-built index would report a flattering garbage
    // slope, the exact phantom the probe exists to catch
    def step(name: String, after: Boolean = true)(body: => Unit): Boolean =
      if (!after) {
        println(s"[scale-probe] $dir index $name SKIPPED (upstream failed)")
        false
      } else
        try { out(name) = time(body); true }
        catch { case e: Throwable =>
          println(s"[scale-probe] $dir index $name FAILED: " +
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          false
        }
    val tb = step("text_build")(
      TextIndexApp.build(spark, docs, s"$work/text", nBuckets = 64))
    val ta = step("text_append", after = tb)(
      TextIndexApp.append(spark, docDelta, s"$work/text"))
    step("text_query", after = ta)(
      TextIndexApp.query(spark, probes, s"$work/text", topK = 10)
        .write.format("noop").mode("overwrite").save())
    val vb = step("vec_build")(
      VectorIndexApp.build(spark, vecs, s"$work/vec", kCells = 64, iters = 2))
    val va = step("vec_append", after = vb)(
      VectorIndexApp.append(spark, vecDelta, s"$work/vec"))
    step("vec_query", after = va)(
      VectorIndexApp.query(spark, vecs, s"$work/vec",
          col("vec_id") < 8, topK = 10, nprobe = 4, rerankK = 40)
        .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    out.foreach { case (k, v) =>
      println(f"[scale-probe] $dir index $k%-12s ${v}%8.2f s") }
    out.toMap
  }

  // ---------------------------------------------------------------- report

  private def report(t1: Map[String, Double], t10: Map[String, Double],
                     i1: Map[String, Double], i10: Map[String, Double])
      : Unit = {
    def fmt(k: String, a: Double, b: Double): String =
      f"| $k%-20s | ${a}%8.2f | ${b}%8.2f | ${b / a}%6.2fx |"
    def both(ks: Seq[String], a: Map[String, Double], b: Map[String, Double]) =
      ks.filter(k => a.contains(k) && b.contains(k))
    println("| probe                |     1x s |   big s |  slope |")
    println("|----------------------|----------|----------|--------|")
    both(ProbeQueries, t1, t10).foreach(k => println(fmt(k, t1(k), t10(k))))
    both(i1.keys.toSeq.sorted, i1, i10)
      .foreach(k => println(fmt(k, i1(k), i10(k))))
    val js = (ks: Seq[String], a: Map[String, Double], b: Map[String, Double]) =>
      both(ks, a, b)
        .map(k => f""""$k":[${a(k)}%.2f,${b(k)}%.2f,${b(k) / a(k)}%.2f]""")
    // one flat joined list: an empty group must not leave a dangling
    // comma (all queries failing at one scale is a REPORTABLE outcome)
    val fields = js(ProbeQueries, t1, t10) ++
      js(i1.keys.toSeq.sorted, i1, i10)
    println(s"""{"scale_probe":{${fields.mkString(",")}}}""")
  }
}
