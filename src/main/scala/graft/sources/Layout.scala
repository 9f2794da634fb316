package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the cheapest query is the one
  * that never reads the data.
  *
  * At 100 TB the dominant cost of most queries is the scan, and the two
  * scan-side levers Spark gives a table owner are:
  *
  *  1. **Partition pruning**: directory-level `partitionBy(col)` — a
  *     filter on the partition column eliminates whole directories at
  *     PLANNING time (visible as the plan's partition-count, before a
  *     single byte is read).
  *  2. **Row-group skipping**: `sortWithinPartitions(col)` clusters
  *     values so parquet min/max statistics make pushed filters
  *     (`PushedFilters` in the plan) skip most row-groups of each file.
  *
  * The reference has no layout layer (Kafka topics + KV stores); this is
  * the warehouse-side capability its Doris sink delegated to Doris'
  * partitioned tables (`util/DorisUtil.java:23-48` ships rows; Doris
  * partitions them). On Spark the table layout IS the engine's job.
  *
  * Layout invariance: rewriting a table through `writePartitioned`
  * changes bytes-on-disk arrangement only — `LayoutSpec` asserts the
  * row multiset is unchanged and that pruning actually removes
  * partitions from the scan.
  */
object Layout {

  /** Rewrite `df` date-partitioned by `day=yyyy-MM-dd` (from `tsCol`),
    * values clustered by `clusterCol` inside each partition. One shuffle
    * (repartition by day) so each partition directory is written by the
    * tasks owning it — without it every task writes a sliver of every
    * day and the table fragments into O(tasks × days) small files (the
    * classic small-file problem at scale). */
  def writePartitionedByDay(df: DataFrame, tsCol: String, clusterCol: String,
                            outDir: String): Unit =
    df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("day"))
      // day leads the sort: the file writer requires local ordering on
      // the partition column, so sorting (day, cluster) satisfies it in
      // ONE pass — sorting by cluster alone would make the writer add a
      // second sort on day, and the clustering would then survive only
      // by sort stability
      .sortWithinPartitions(col("day"), col(clusterCol))
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(outDir)

  /** Read back a day-partitioned table. */
  def readPartitioned(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)

  /** Count of partition directories the physical plan will actually
    * read for `df` (after partition pruning). Diagnostic used by
    * LayoutSpec to prove pruning happened at planning time. */
  def scannedPartitions(df: DataFrame): Long = {
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    require(scans.nonEmpty, "no file scan in plan")
    scans.map(f => f.relation.location.listFiles(
      f.partitionFilters, f.dataFilters).size.toLong).sum
  }
}
