package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.StableHash
import graft.queries.TextQueries

/** The full training-data RELEASE pipeline as one batch job — what a
  * data team runs before shipping a corpus snapshot:
  *
  *   1. clean     — quality + language gate, exact-dedup canonicals,
  *                  MinHash-LSH near-dup removal (the c1 pipeline)
  *   2. decontam  — drop documents sharing n-gram evidence with the
  *                  benchmark set (the c2 check, as an anti-join)
  *   3. split     — deterministic train/validation/test assignment
  *                  (stable60(doc_id) % 100 → 80/10/10; reproducible
  *                  across runs, engines, and re-shards)
  *   4. write     — ONE pass, partitioned by split (consumers read
  *                  their split via partition pruning, never a scan)
  *
  * Usage: `runMain graft.apps.CorpusReleaseApp <sfDir> <outDir>`
  */
object CorpusReleaseApp {

  def release(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    val clean = TextQueries.queries("c1_clean_corpus")(spark, sfDir)
    val contaminated = TextQueries.queries("c2_decontaminate")(spark, sfDir)
      .select("doc_id").distinct()
    clean
      .join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("__h", StableHash.bucket60(col("doc_id").cast("string"), 100))
      .withColumn("split",
        when(col("__h") < 80, "train")
          .when(col("__h") < 90, "validation").otherwise("test"))
      .drop("__h")
      .write.mode("overwrite").partitionBy("split").parquet(outDir)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local("graft-corpus-release")
    try release(spark, sfDir, outDir) finally spark.stop()
  }
}
