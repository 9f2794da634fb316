package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.WindowOps

/** Watermarked event-time windowing — the streaming form of
  * [[graft.operators.WindowOps]].
  *
  * Mirrors the reference's time machinery:
  *  - W1 tumbling event-time windows (`util/Common.java:9` — 10 s)
  *  - W2/W3 bounded-out-of-orderness watermark (`util/FlinkSqlUtil.java:18`
  *    — `rt - INTERVAL '2' SECOND`)
  *  - W4 window metadata stt/edt/cur_date (`util/WindowUtil.java:17-25`)
  *  - W5 late-data drop: rows older than watermark − delay never reach
  *    the aggregation (asserted in `WindowingSpec`)
  *
  * In append output mode a window emits exactly once, when the watermark
  * passes its end — the streaming equivalent of Flink's on-watermark window
  * fire. State per in-flight window is bounded by (delay / window size)
  * windows per key group, so executor state survives any input volume. */
object Windows {

  /** Tumbling watermarked aggregation. `aggs` as in `RelationalGroupedDataset
    * .agg`; output carries stt/edt/cur_date like the batch twin. */
  def tumblingAgg(df: DataFrame, ts: String, size: String, delay: String,
                  keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val grouped = df.withWatermark(ts, delay)
      .groupBy(window(col(ts), size) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
    WindowOps.withWindowMeta(grouped)
  }
}
