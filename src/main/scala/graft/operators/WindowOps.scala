package graft.operators

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Tumbling-window aggregation with the reference's window metadata.
  *
  * Every DWS app aggregates per 10 s tumbling event-time window
  * (`util/Common.java:9`) and copies window start/end into
  * `stt`/`edt` strings `yyyy-MM-dd HH:mm:ss` plus a `cur_date`
  * (`util/WindowUtil.java:17-25`, `util/DateFormatUtil.java:38-42`).
  *
  * Spark's `window()` is epoch-aligned tumbling — same bucketing as
  * Flink's `TumblingEventTimeWindows` — and the formatted bounds are
  * reproducible in DuckDB via `time_bucket` + `strftime`, keeping windowed
  * aggregates oracle-checkable.
  */
object WindowOps {
  val Fmt = "yyyy-MM-dd HH:mm:ss"

  /** Group by a tumbling window plus keys; caller supplies aggregates. */
  def tumbling(df: DataFrame, ts: Column, size: String,
               keys: Seq[Column]): RelationalGroupedDataset =
    df.groupBy(window(ts, size) +: keys: _*)

  /** Project the reference's window-metadata columns (W4) and drop the
    * struct. Apply after aggregation. */
  def withWindowMeta(df: DataFrame): DataFrame =
    df.withColumn("stt", date_format(col("window.start"), Fmt))
      .withColumn("edt", date_format(col("window.end"), Fmt))
      .withColumn("cur_date", date_format(col("window.start"), "yyyy-MM-dd"))
      .drop("window")
}
