package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join patterns from the reference, Spark-first.
  *
  *  - J1/J2 stream-stream equi/left joins → plain Catalyst joins (batch) or
  *    watermarked stream-stream joins (streaming pipelines).
  *  - J3 lookup (temporal) join `FOR SYSTEM_TIME AS OF pt`
  *    (`app/dwd/DwdInterationCommentInfo.java:64-78`) → broadcast hash join
  *    against the dim snapshot; the per-record async/thread-pool/Redis
  *    machinery of J6/J7/J8 (`app/dws/func/AddDim*`) collapses into the
  *    same broadcast join — Catalyst chains N of them without extra
  *    shuffles because the fact side's partitioning is untouched.
  *  - J4 interval join (`app/dwd/DwdTradePayDetailSuc.java:100-127`) →
  *    equi-join on the key + range predicate on the time columns; Spark
  *    plans it as a hash join with a residual filter, so cost stays
  *    O(matches-per-key), not O(cartesian).
  *
  * Scale notes: dims are broadcast (no shuffle on the fact table); the
  * interval join shuffles both sides once on the equi-key; with AQE on,
  * skewed keys split automatically.
  */
object JoinOps {

  /** J3/J6 — enrich facts with a chain of small dimension tables via
    * broadcast hash joins. Each element: (dimDf, joinCondition, columns to
    * keep from the dim side). */
  def dimChain(fact: DataFrame,
               dims: Seq[(DataFrame, Column, Seq[Column])]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, cond, keep)) =>
      acc.join(broadcast(dim), cond, "left")
        .select(acc.columns.map(acc(_)) ++ keep: _*)
    }

  /** J4 — interval join: rows of `left` matched to rows of `right` with the
    * same key and right.ts in [left.ts + lower, left.ts + upper]. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyL: Column, keyR: Column,
                   tsL: Column, tsR: Column,
                   lower: Column, upper: Column): DataFrame =
    left.join(right,
      keyL === keyR && tsR >= tsL + lower && tsR <= tsL + upper,
      "inner")
}
