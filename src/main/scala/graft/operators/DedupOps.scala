package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic keyed deduplication (batch form).
  *
  * The reference implements keep-first / keep-last with keyed ValueState +
  * TTL (`app/dws/DwsTradeSkuOrderWindow.java:111-148`,
  * `app/lab/DwsLeftJoinDuplication03Last.java:54-79`); the streaming
  * equivalents live in [[graft.streaming.StatefulOps]]. The batch forms
  * here use `row_number` over an explicit total order — unlike
  * `dropDuplicates`, the surviving row is deterministic, which the
  * DuckDB-oracle hash check requires.
  *
  * Scale note: `row_number` over (key → order) is one shuffle on the key,
  * with in-partition sort — no driver state, AQE-skew-splittable; survives
  * 100 TB provided keys aren't pathologically hot (salt first if they are).
  */
object DedupOps {

  /** Keep the first row per key under `order` (A5 keep-first). */
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(keys: _*).orderBy(order: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Keep the last row per key (A6 keep-last): reverse the order. */
  def keepLast(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order.map(_.desc))

  /** Keep at most `cap` rows per key under `order` (per-key contribution
    * cap — keepFirst generalized from 1 to n). Spark's WindowGroupLimit
    * pushes the rank filter below the shuffle, bounding per-partition
    * buffers at `cap`. */
  def capPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                cap: Int): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(keys: _*).orderBy(order: _*)))
      .filter(col("__rn") <= cap)
      .drop("__rn")
}
