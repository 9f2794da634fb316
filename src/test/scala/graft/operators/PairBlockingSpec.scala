package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r16 block-stage rewrite ([[SimilarityOps.pairsWithinBuckets]] /
  * [[SimilarityOps.minhashBandsPacked]]) must be a pure plan change:
  * same pair set as the window-count + self-join form it replaced, and
  * packed numeric band keys must induce exactly the md5 form's
  * buckets. */
class PairBlockingSpec extends SparkSpec {
  import spark.implicits._

  // synthetic band rows with collisions AND a flood bucket over the cap
  private def bandRows(cap: Int) = {
    val flood = (0 until cap + 5).map(i => (1000L + i, 0, "hot"))
    val pairs = Seq((1L, 0, "a"), (2L, 0, "a"), (3L, 0, "a"), // 3-bucket
      (1L, 1, "z"), (4L, 1, "z"), // cross-band pair
      (2L, 1, "q"), // singleton
      (5L, 2, "m"), (6L, 2, "m"))
    (flood ++ pairs).toDF("__id", "band", "sig")
  }

  /** The pre-r16 formulation, kept as the reference semantics. */
  private def referencePairs(bands: org.apache.spark.sql.DataFrame,
                             cap: Int) = {
    import org.apache.spark.sql.expressions.Window
    val sized = bands.withColumn("__bc", count(lit(1)).over(
      Window.partitionBy("band", "sig"))).filter(col("__bc") <= cap)
    val l = sized.select(col("band"), col("sig"), col("__id").as("a"))
    val r = sized.select(col("band"), col("sig"), col("__id").as("b"))
    l.join(r, Seq("band", "sig")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  test("pairsWithinBuckets == window+self-join reference, flood cap included") {
    val cap = 10
    val bands = bandRows(cap)
    val got = SimilarityOps.pairsWithinBuckets(bands, Seq("band", "sig"), cap)
      .as[(Long, Long)].collect().toSet
    val want = referencePairs(bands, cap).as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got.contains((1L, 2L)) && got.contains((1L, 4L)) &&
      got.contains((5L, 6L)))
    assert(!got.exists { case (a, b) => a >= 1000L && b >= 1000L },
      "flood bucket must be skipped")
  }

  test("packed numeric band keys bucket exactly like the md5 string keys") {
    // signature frame with deliberate shared bands
    val sig = Seq(
      (1L, 10L, 20L, 30L, 40L, 5L, 6L, 7L, 8L),
      (2L, 10L, 20L, 30L, 40L, 1L, 2L, 3L, 4L), // shares band 0 with id 1
      (3L, 10L, 20L, 99L, 40L, 1L, 2L, 3L, 4L), // shares band 1 with id 2
      (4L, 11L, 20L, 30L, 40L, 9L, 9L, 9L, 9L)) // shares nothing
      .toDF("__id", "mh0", "mh1", "mh2", "mh3", "mh4", "mh5", "mh6", "mh7")
    val packed = SimilarityOps.pairsWithinBuckets(
      SimilarityOps.minhashBandsPacked(sig, 8, 4),
      SimilarityOps.packedSigKeys(4)).as[(Long, Long)].collect().toSet
    val md5 = SimilarityOps.candidatePairs(
      SimilarityOps.lshBands(sig, 8, 4)).as[(Long, Long)].collect().toSet
    assert(packed == md5)
    assert(packed == Set((1L, 2L), (2L, 3L)))
  }
}
