package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation for aggregations.
  *
  * AQE's skew-join splitting (on in [[graft.GraftSession]]) handles
  * skewed JOINS at runtime; a skewed AGGREGATION key still funnels every
  * row of the hot key through one reducer. The classic fix is salted
  * two-phase aggregation: spray each key over `saltBuckets` sub-keys,
  * partially aggregate per (key, salt), then merge per key — the hot
  * key's work spreads over `saltBuckets` reducers and the final merge
  * sees only `saltBuckets` rows per key. Only ALGEBRAIC aggregates
  * (sum/count/min/max — anything with an associative merge) can run this
  * way; the caller supplies the partial and merge forms.
  *
  * The reference sidesteps the problem with HBase row-key salting
  * (`util/HBaseUtil.java:140-147`, our [[graft.functions.StableHash.bucket60]]);
  * this operator is the aggregation-side counterpart.
  */
object SkewOps {

  /** Salted two-phase aggregation. `partial` aggregates run per
    * (keys, salt); `merge` aggregates run per keys over the partials.
    * Salt assignment is row-arbitrary (not content-based) — any
    * assignment yields the same final result for algebraic aggregates,
    * which is what makes the rewrite safe. */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltBuckets: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys: _*)
      .agg(merge.head, merge.tail: _*)
}
