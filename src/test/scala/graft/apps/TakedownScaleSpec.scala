package graft.apps

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Takedown cost must track the HIT-FILE count, not the index size —
  * the retraction twin of the append soak's "same delta, 10× base,
  * equal wall". The same fixed-size id set is retracted from a 1× and
  * a 10× index; the primary (machine-independent) gate is that both
  * takedowns run the SAME bounded job count — the plan never grows
  * with the index — with the wall ratio as loose secondary evidence.
  * The known O(index) residue is the discovery scan's footer read
  * (parquet min/max pruning reads every cell file's footer); footers
  * are ~KB regardless of file size, so it scales with FILE COUNT,
  * which compaction now bounds ([[Compaction]]). */
class TakedownScaleSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("vec_id"),
      array((0 until 4).map(i =>
        (pmod(col("id") * (7 * i + 3), lit(997)).cast("float") / lit(997f))
          + lit(0.01f)): _*).cast("array<float>").as("embedding"))

  test("retracting the same id set from a 1x and a 10x index: same jobs, wall tracks hits") {
    assume(sys.env.contains("GRAFT_SOAK"), "soak opt-in: set GRAFT_SOAK=1")
    val small = Files.createTempDirectory("td-1x").toString
    val big = Files.createTempDirectory("td-10x").toString
    VectorIndexApp.build(spark, vecs(0, 2000), small, kCells = 8, iters = 1)
    VectorIndexApp.build(spark, vecs(0, 20000), big, kCells = 8, iters = 1)

    // the same FIXED-SIZE target set, present in both indexes
    val targets = (100L until 120L).toSeq

    def hitFiles(idx: String): Long = spark.read.parquet(s"$idx/codes")
      .filter(col("vec_id").isin(targets: _*))
      .select(input_file_name()).distinct().count()

    def timedRetract(idx: String, tag: String): (Double, Int) = {
      spark.sparkContext.setJobGroup(tag, s"takedown $tag")
      val t0 = System.nanoTime()
      try VectorIndexApp.retract(spark, targets, idx)
      finally spark.sparkContext.clearJobGroup()
      ((System.nanoTime() - t0) / 1e9, stableJobCount(tag))
    }

    val (hitsSmall, hitsBig) = (hitFiles(small), hitFiles(big))
    val (wSmall, jSmall) = timedRetract(small, "td-small")
    val (wBig, jBig) = timedRetract(big, "td-big")
    info(f"1x: $hitsSmall hit files, $jSmall jobs, $wSmall%.1f s; " +
      f"10x: $hitsBig hit files, $jBig jobs, $wBig%.1f s")

    // correctness on both
    assert(spark.read.parquet(s"$small/codes")
      .filter(col("vec_id").isin(targets: _*)).count() == 0)
    assert(spark.read.parquet(s"$big/codes")
      .filter(col("vec_id").isin(targets: _*)).count() == 0)
    assert(spark.read.parquet(s"$big/codes").count() == 20000 - targets.length)

    // PRIMARY gate, machine-independent: the takedown's job count is a
    // property of the PLAN (discovery + one staged rewrite pass), so a
    // 10x index may not add jobs — an O(index) regression (per-file
    // loops, a widened discovery) shows up here first
    assert(jBig <= jSmall,
      s"takedown jobs grew with the index: $jSmall (1x) -> $jBig (10x)")
    assert(jSmall <= 10, s"takedown ran $jSmall jobs — plan no longer bounded")

    // SECONDARY, loose on purpose (shared-box walls): both indexes are
    // compacted (one file per cell), so hit files are comparable and
    // the 10x wall may not approach 10x — 3x + 1s catches an O(index)
    // data-read blow-up, not scheduler noise
    assert(hitsBig <= hitsSmall * 2,
      s"hit-file count diverged: $hitsSmall vs $hitsBig — fixture broke")
    assert(wBig <= wSmall * 3 + 1.0,
      f"10x takedown cost $wBig%.1f s vs $wSmall%.1f s — tracking index size, not hits")
  }
}
