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

  /** Salted replicated join for a skewed JOIN key when the small side is
    * too big to broadcast and AQE's skew splitting is unavailable (e.g.
    * the skew is on the BUILD side of a shuffled hash join, or the plan
    * is pinned): the big side gets a per-row salt, the small side is
    * replicated once per salt value, and the join key widens to
    * (key, salt) — the hot key's rows spread over `saltBuckets` reducers
    * instead of funneling through one. Result == the plain join (every
    * big-side row still meets every matching small-side row exactly
    * once, under exactly one salt). Replication multiplies the small
    * side by `saltBuckets` — the knob trades small-side shuffle volume
    * for hot-key spread. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: Column, smallKey: Column,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    // Replication is only transparent when unmatched SMALL-side rows
    // never surface: right/full outer would emit each unmatched small
    // row once per replica (saltBuckets copies), breaking the
    // "result == plain join" contract. Explicit alias allowlist — a
    // normalize-by-deletion scheme would let "outer" (Spark's alias for
    // FULL outer) slip through as the empty string.
    val safeAliases = Set(
      "inner",
      "left", "leftouter", "left_outer",
      "semi", "leftsemi", "left_semi",
      "anti", "leftanti", "left_anti")
    require(safeAliases(joinType.toLowerCase),
      s"saltedJoin supports inner/left/semi/anti only, got $joinType")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)))
    val replicated = small.withColumn("__rsalt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted
      .join(replicated.hint("shuffle_hash"), // demo the non-broadcast path
        bigKey === smallKey && col("__salt") === col("__rsalt"), joinType)
      .drop("__salt", "__rsalt")
  }
}
