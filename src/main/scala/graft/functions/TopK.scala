package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Bounded top-k typed aggregator (U4 tier — `Aggregator[IN, BUF, OUT]`).
  *
  * Spark has no per-group top-k operator: the `row_number() OVER
  * (PARTITION BY …) <= k` formulation shuffles EVERY candidate row to its
  * group's reducer and sorts there. An algebraic top-k aggregate instead
  * rides the standard partial-aggregation machinery: each map task keeps
  * a bounded k-element buffer per group, and only those k rows per
  * (group × partition) reach the shuffle — at 100 TB with thousands of
  * candidates per probe this is the difference between shuffling the
  * candidate set and shuffling k·partitions rows.
  *
  * Order is the ANN contract: score DESC, then id ASC — a TOTAL order, so
  * the k survivors are independent of arrival/merge order and the result
  * stays oracle-deterministic. */
object TopK {

  /** One scored candidate: (score, id). */
  type Scored = (Double, Long)

  /** Scored candidate with a string payload: (score, label). */
  type ScoredS = (Double, String)

  private val ord: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)] { case (s, id) => (-s, id) }
  private val ordS: Ordering[ScoredS] =
    Ordering.by[ScoredS, (Double, String)] { case (s, id) => (-s, id) }

  /** Aggregator keeping the k largest elements of a TOTAL order. The
    * buffer is a sorted ≤k-element vector — reduce is O(k) insert-trim,
    * merge an O(k) sorted merge. */
  final class TopKAgg[I](k: Int, ord: Ordering[I], enc: Encoder[Seq[I]])
      extends Aggregator[I, Seq[I], Seq[I]] {
    override def zero: Seq[I] = Vector.empty

    override def reduce(buf: Seq[I], in: I): Seq[I] =
      if (buf.size < k) (buf :+ in).sorted(ord)
      else if (ord.lt(in, buf.last)) (buf.init :+ in).sorted(ord)
      else buf

    override def merge(a: Seq[I], b: Seq[I]): Seq[I] =
      (a ++ b).sorted(ord).take(k)

    override def finish(buf: Seq[I]): Seq[I] = buf

    override def bufferEncoder: Encoder[Seq[I]] = enc
    override def outputEncoder: Encoder[Seq[I]] = enc
  }

  /** Column-world entry point: `groupBy(g).agg(topK(5)(struct-in))`.
    * Call as `topK(k)(col(score), col(id))`. */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAgg[Scored](k, ord, ExpressionEncoder[Seq[Scored]]()),
      ExpressionEncoder[Scored]())

  /** Same, keyed by a string label: `topKStr(k)(col(score), col(label))`.
    * Ties break label-ascending, keeping results oracle-deterministic. */
  def topKStr(k: Int): UserDefinedFunction =
    udaf(new TopKAgg[ScoredS](k, ordS, ExpressionEncoder[Seq[ScoredS]]()),
      ExpressionEncoder[ScoredS]())
}
