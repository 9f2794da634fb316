package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's PER-PASS canary normalization ([[Bench.normalizedSum]])
  * — the round-13 scheme (`median_sum / median(all canary samples)`)
  * failed its own premise in its debut round: two same-tree runs
  * diverged 38% normalized while raw sums agreed within 8%, because a
  * query's median and the canary's median could come from different
  * passes under different ambient load. Pinned here:
  *
  *  - the arithmetic: each sample divides by ITS OWN pass's canary,
  *    the per-query median is taken over normalized samples, then
  *    summed;
  *  - the invariance the scheme exists for: a pass-wide ambient
  *    slowdown that hits queries and canary alike cancels EXACTLY,
  *    whatever mix of loaded and quiet passes a run sees — so two
  *    same-tree runs under different (pass-steady) load produce the
  *    SAME normalized sum, which is precisely what the r13 scheme
  *    could not guarantee;
  *  - the failure mode of the old scheme, reproduced: under asymmetric
  *    per-query noise the global-median divisor pairs a query median
  *    from one load level with a canary median from another. */
class BenchNormalizationSpec extends AnyFunSuite {

  private def close(a: Double, b: Double, eps: Double = 1e-9): Boolean =
    math.abs(a - b) <= eps * math.max(1.0, math.abs(b))

  test("per-pass normalization: the arithmetic (divide by own pass, median, sum)") {
    val samples = Map(
      "q1" -> Seq((1, 2.0), (2, 8.0), (3, 2.0)),
      "q2" -> Seq((1, 1.0), (2, 4.0), (3, 1.0)))
    val canaries = Map(1 -> 0.5, 2 -> 2.0, 3 -> 0.5)
    // q1 normalized: (4, 4, 4) → 4; q2: (2, 2, 2) → 2; sum 6
    assert(close(Bench.normalizedSum(samples, canaries), 6.0))
  }

  test("a pass-wide slowdown hitting queries and canary alike cancels exactly") {
    val trueCost = Map("q1" -> 3.0, "q2" -> 0.7, "q3" -> 11.0)
    val trueCanary = 0.5
    def run(passLoads: Seq[Double]): Double = {
      val samples = trueCost.map { case (q, t) =>
        q -> passLoads.zipWithIndex.map { case (l, i) => (i + 1, t * l) }
      }
      val canaries = passLoads.zipWithIndex
        .map { case (l, i) => (i + 1) -> trueCanary * l }.toMap
      Bench.normalizedSum(samples, canaries)
    }
    val quiet = run(Seq(1.0, 1.0, 1.0))
    // any mix of loaded passes — including the co-tenant reality of one
    // run quiet and the next 2× loaded — lands on the same number
    assert(close(run(Seq(3.0, 1.0, 1.0)), quiet))
    assert(close(run(Seq(1.0, 4.0, 2.0)), quiet))
    assert(close(run(Seq(2.0, 2.0, 2.0)), quiet))
    assert(close(quiet, trueCost.values.sum / trueCanary))
  }

  test("the r13 global-median scheme does NOT cancel what per-pass does") {
    // loads per pass: [1, 4, 4]; one query is noisy in the opposite
    // direction (its quiet pass got hit by a transient), so its raw
    // median lands on a LOADED pass while the canary median would too
    // — but a second run with loads [1, 1, 4] flips which load level
    // each median comes from. Per-pass normalization returns the same
    // answer for both runs; the old scheme's answers differ.
    def oldScheme(samples: Map[String, Seq[(Int, Double)]],
                  canaries: Seq[Double]): Double = {
      val mediansum = samples.values.map(ss =>
        Bench.medianOf(ss.map(_._2))).sum
      mediansum / Bench.medianOf(canaries)
    }
    val c = 1.0
    def mk(loads: Seq[Double]) = (
      Map("q" -> loads.zipWithIndex.map { case (l, i) => (i + 1, 10.0 * l) }),
      loads.map(_ * c),
      loads.zipWithIndex.map { case (l, i) => (i + 1) -> l * c }.toMap)
    val (sA, cA, pA) = mk(Seq(1.0, 4.0, 4.0))
    val (sB, cB, pB) = mk(Seq(1.0, 1.0, 4.0))
    // per-pass: identical across the two load mixes
    assert(close(Bench.normalizedSum(sA, pA), Bench.normalizedSum(sB, pB)))
    // old scheme agrees here (medians align) — but break the alignment
    // with one transient-poisoned sample and it diverges while the
    // per-pass answer moves only by the median's transient-discarding
    // bound. q's pass-2 sample takes a 3× transient the canary missed:
    val sA2 = Map("q" -> Seq((1, 10.0), (2, 120.0), (3, 40.0)))
    val oldA2 = oldScheme(sA2, cA) // median 40 / canary median 4 = 10 ✓ (lucky)
    val sB2 = Map("q" -> Seq((1, 10.0), (2, 30.0), (3, 40.0)))
    val oldB2 = oldScheme(sB2, cB) // median 30 / canary median 1 = 30 ✗
    assert(!close(oldA2, oldB2),
      "expected the old scheme to diverge across load mixes")
    // the per-pass scheme keeps both runs within the median's bound:
    // normalized samples (10, 30, 10) → 10 and (10, 30, 10) → 10
    assert(close(Bench.normalizedSum(sA2, pA), Bench.normalizedSum(sB2, pB)))
  }

  test("errored queries (no samples) contribute zero, matching the raw-sum convention") {
    val samples = Map("ok" -> Seq((1, 2.0)), "err" -> Seq.empty[(Int, Double)])
    assert(close(Bench.normalizedSum(samples, Map(1 -> 1.0)), 2.0))
  }
}
