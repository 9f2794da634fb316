package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are sized for the local[32] test harness but chosen so the same
  * settings scale to a real cluster: AQE on (runtime re-plan, skew-join
  * splitting), small shuffle-partition count locally (the reference pins
  * parallelism to its Kafka partition count — `util/Common.java:8` — we pin
  * to cores), UTC session time zone so timestamp arithmetic matches the
  * DuckDB oracle.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      // native engine expressions (vec_dot & co.) — see graft.plans
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read as Long ns and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
  }

  /** Local session for tests and the Verify/Bench mains. */
  def local(appName: String = "graft", cores: Int = 0): SparkSession = {
    val n =
      if (cores > 0) cores.toString
      else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = builder(appName).master(s"local[$n]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
