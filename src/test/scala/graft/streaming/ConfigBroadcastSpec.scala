package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConfigBroadcastSpec extends SparkSpec {
  import spark.implicits._

  test("config edits take effect at the next micro-batch (hot reload)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cfgDir = Files.createTempDirectory("cfg").toString + "/rules"
    val outDir = Files.createTempDirectory("cfgout").toString + "/out"
    val ckpt = Files.createTempDirectory("cfgckpt").toString

    // initial rules: only 'click' is routed
    Seq(("click", "t_click")).toDF("etype", "topic")
      .write.mode("overwrite").parquet(cfgDir)

    val mem = MemoryStream[(String, Long)]
    val q = ConfigBroadcast.foreachBatchWithConfig(
      mem.toDF().toDF("etype", "id"), cfgDir, ckpt) { (batch, config, _) =>
      batch.join(broadcast(config), "etype")
        .select("topic", "id")
        .write.mode("append").parquet(outDir)
    }
    try {
      mem.addData(Seq(("click", 1L), ("view", 2L)))
      q.processAllAvailable()
      // hot-reload: routing rules change while the stream is running
      Seq(("click", "t_click"), ("view", "t_view")).toDF("etype", "topic")
        .write.mode("overwrite").parquet(cfgDir)
      mem.addData(Seq(("click", 3L), ("view", 4L)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(outDir).as[(String, Long)].collect().toSet
    // batch1: view dropped (no rule yet); batch2: view routed
    assert(got == Set(("t_click", 1L), ("t_click", 3L), ("t_view", 4L)))
  }
}
