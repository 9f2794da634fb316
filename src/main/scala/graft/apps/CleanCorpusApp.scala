package graft.apps

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.queries.TextQueries

/** LLM-training-data entry point: run the corpus-cleaning pipeline
  * (quality + language scoring, exact-dedup canonicalization, MinHash-LSH
  * near-dup removal — `c1_clean_corpus`) over a testdata-layout directory
  * and write the surviving document ids + scores as parquet.
  *
  * Usage: `runMain graft.apps.CleanCorpusApp <sfDir> <outDir>`
  */
object CleanCorpusApp {

  def run(spark: SparkSession, sfDir: String, outDir: String): Unit =
    TextQueries.queries("c1_clean_corpus")(spark, sfDir)
      .write.mode("overwrite").parquet(outDir)

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local("graft-clean-corpus")
    try run(spark, sfDir, outDir) finally spark.stop()
  }
}
