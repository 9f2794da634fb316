package graft

import org.apache.spark.sql.functions._

import graft.apps.VectorIndexApp
import graft.operators.SimilarityOps

/** Dev utility (round-16 measurement, not a registered query): the
  * retrain-wall probe for the sampled-training change (r15 verdict #4).
  * Generates an N-vector 64-dim synthetic corpus (deterministic), builds
  * an IVFADC index, times [[VectorIndexApp.retrain]] at a widened cell
  * count, and times the coarse k-means ALONE both unsampled and sampled
  * so the training share of the wall is attributable.
  * `runMain graft.Profile16 [n] [kCells]` — defaults 2 000 000 / 256
  * (≈1000× the sf0.1 embeddings table). */
object Profile16 {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val dir = args.lift(2).getOrElse("/tmp/p16")
    val spark = GraftSession.local("graft-profile16")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p16] $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    spark.range(0, n).select(col("id").as("vec_id"),
        array((0 until 64).map(i =>
          (pmod(col("id") * (7 * i + 3) + i, lit(997)).cast("float") / lit(997f))
            + lit(0.01f)): _*).as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/emb.parquet")
    val corpus = spark.read.parquet(s"$dir/emb.parquet")
    val g = VectorIndexApp.PqGeometry(4, 16, 16, 2)
    time("build kCells=64 (sampled trainer)")(
      VectorIndexApp.build(spark, corpus, s"$dir/idx", 64, 2, Some(g)))
    time(s"retrain kCells=$k (sampled trainer)")(
      VectorIndexApp.retrain(spark, corpus, s"$dir/idx", k, 2))
    time(s"coarse k-means k=$k UNSAMPLED")(
      SimilarityOps.kmeansCodebook(corpus, k, 2).count())
    val sample = VectorIndexApp.trainingSample(corpus, k, Some(g), n)
    time(s"coarse k-means k=$k sampled")(
      SimilarityOps.kmeansCodebook(sample, k, 2).count())
    spark.stop()
  }
}
