package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through here so that scan-level concerns (schema pruning,
  * filter pushdown — visible as `PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`) stay consistent. On a real cluster these would
  * be partitioned/bucketed external tables; the API is the same.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as Long ns.
    * Normalize to TimestampType by integer-dividing to µs — the same
    * truncation DuckDB applies reading ns into its µs timestamps, so
    * oracle comparisons agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Page-cache warm-up shared by the timing harnesses (Bench, the
    * scale probe): MATERIALIZE every column of every table via a noop
    * write — count() reads only parquet footers, which left the first
    * timed queries paying the disk fill and showing as phantom
    * regressions in earlier rounds. Missing tables are skipped. */
  def warm(spark: SparkSession, dir: String): Unit =
    all.foreach { t =>
      try load(spark, dir, t)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
}
