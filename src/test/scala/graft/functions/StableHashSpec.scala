package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class StableHashSpec extends SparkSpec {
  import spark.implicits._

  test("stable60 column matches the Scala-side mirror") {
    val inputs = Seq("", "a", "hello world", "Ünïcode ✓ 中文", "0", "  spaces  ")
    val got = inputs.toDF("s").select(StableHash.stable60(col("s")))
      .as[Long].collect().toSeq
    assert(got == inputs.map(StableHash.stable60Local))
  }

  test("stable60 is non-negative and fits in 60 bits") {
    val samples = (0 until 200).flatMap(i =>
      Gen.asciiPrintableStr.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(samples.nonEmpty)
    samples.foreach { s =>
      val v = StableHash.stable60Local(s)
      assert(v >= 0L && v < (1L << 60))
    }
  }

  test("bucket60 lands in [0, n)") {
    val n = 60
    val buckets = (1 to 500).map(i => s"key$i").toDF("s")
      .select(StableHash.bucket60(col("s"), n)).as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < n))
    // salting must actually spread keys, not collapse them
    assert(buckets.distinct.length > n / 2)
  }

  test("minhashParams is deterministic and in range") {
    val p1 = StableHash.minhashParams(16)
    val p2 = StableHash.minhashParams(16)
    assert(p1 == p2)
    assert(p1.forall { case (a, b) =>
      a >= 1 && a < StableHash.MersennePrime &&
        b >= 0 && b < StableHash.MersennePrime
    })
    assert(p1.distinct.length == 16)
  }

  test("perm stays within [0, p) for in-range input") {
    val (a, b) = StableHash.minhashParams(1).head
    val vals = (0L until 1000L).toDF("x")
      .select(StableHash.perm(col("x"), a, b)).as[Long].collect()
    assert(vals.forall(v => v >= 0 && v < StableHash.MersennePrime))
  }

  test("lshPlanes is deterministic with integer-valued components") {
    val p = StableHash.lshPlanes(4, 64)
    assert(p == StableHash.lshPlanes(4, 64))
    assert(p.flatten.forall(x => x == math.rint(x) && math.abs(x) <= 9))
  }
}
