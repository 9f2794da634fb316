package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CdcQueries, CoreQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented operator from SURVEY §2 (and the
  * LLM-pipeline extensions) to a batch DataFrame program over the
  * driver's parquet tables; `oracleSql` holds the DuckDB-equivalent SQL
  * the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * c1 composes the widest slice of the engine: quality + language
    * scoring, exact-dedup canonicalization, and MinHash-LSH near-dup
    * removal in one pipeline. */
  def entry(spark: SparkSession): DataFrame =
    TextQueries.queries("c1_clean_corpus")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ TextQueries.queries ++ SimilarityQueries.queries ++
      CdcQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ TextQueries.oracles ++ SimilarityQueries.oracles ++
      CdcQueries.oracles
}
