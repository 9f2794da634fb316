package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.StableHash
import graft.operators.SimilarityOps
import graft.sources.Tables

/** Invariants of the round-8 curation additions the row-hash oracle
  * cannot express: d9's representative-selection semantics across
  * thresholds, u11's exact hash-gate membership, and u12's
  * permutation/order contract. sf0.001 keeps the suite fast; every
  * property is scale-free. */
class MixShuffleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("d9 semantic dedup: cluster minima kept, dup set shrinks as τ rises") {
    val e = Tables.embeddings(spark, sf)
    val cb = SimilarityOps.kmeansCodebook(e, 16, 2)
    val lo = SimilarityOps.semanticDedup(e, cb, 0.4).collect()
    val hi = SimilarityOps.semanticDedup(e, cb, 0.9).collect()
    def dups(rows: Array[Row]): Set[Long] =
      rows.filter(_.getAs[Int]("is_dup") == 1).map(_.getAs[Long]("vec_id")).toSet
    // every corpus vector appears exactly once
    assert(lo.map(_.getAs[Long]("vec_id")).distinct.length == lo.length)
    assert(lo.length == e.count())
    // the lowest id in a cluster has no smaller clustermate — never a dup
    lo.groupBy(_.getAs[Long]("cluster")).foreach { case (_, rs) =>
      val mn = rs.minBy(_.getAs[Long]("vec_id"))
      assert(mn.getAs[Int]("is_dup") == 0,
        s"cluster minimum ${mn.getAs[Long]("vec_id")} flagged as dup")
    }
    // ε-dedup is monotone in the threshold; some dups exist at τ = 0.4
    assert(dups(lo).nonEmpty, "τ=0.4 should find semantic dups at sf0.001")
    assert(dups(hi).subsetOf(dups(lo)))
    // an unsatisfiable threshold keeps everything
    val none = SimilarityOps.semanticDedup(e, cb, 1.5).collect()
    assert(none.forall(_.getAs[Int]("is_dup") == 0))
  }

  test("u11 temperature sampling: exact hash-gate membership per source") {
    val out = TextQueries.queries("u11_temperature_sample")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "source").collect()
    assert(out.nonEmpty && out.length <= docs.length)
    val rate = out.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.head.getAs[Long]("rate_ppm")).toMap
    rate.values.foreach(r => assert(r >= 1L && r <= 1000000L))
    val kept = out.map(_.getAs[Long]("doc_id")).toSet
    // for every source with a known rate, membership is EXACTLY the
    // 60-bit hash gate — no doc wrongly kept or dropped
    docs.filter(r => rate.contains(r.getAs[String]("source"))).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val in = StableHash.stable60Local(id.toString) % 1000000L <
        rate(r.getAs[String]("source"))
      assert(kept.contains(id) == in, s"doc $id membership mismatch")
    }
    // full-rate sources keep every document
    val perSource = docs.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      if (rate(src) == 1000000L) assert(rs.length == perSource(src))
    }
  }

  test("c5 split leakage: exactly d3's pairs that straddle the u4 split rule") {
    val pairs = SimilarityQueries.queries("d3_minhash_neardup")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    def split(id: Long): String = {
      val h = StableHash.stable60Local(id.toString) % 100
      if (h < 80) "train" else if (h < 90) "validation" else "test"
    }
    val leaks = TextQueries.queries("c5_split_leakage")(spark, sf).collect()
    leaks.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(pairs.contains((a, b)), s"leak pair ($a,$b) not a d3 near-dup")
      assert(r.getAs[String]("split_a") == split(a))
      assert(r.getAs[String]("split_b") == split(b))
      assert(split(a) != split(b))
    }
    // completeness: every d3 pair that straddles the split is reported
    val expected = pairs.filter { case (a, b) => split(a) != split(b) }
    assert(leaks.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet == expected)
  }

  test("d10 keeps the highest-quality copy within each duplicate group") {
    // sf0.1 is the one SF with real duplicate groups (8 of them) —
    // smaller SFs degenerate d10 to the identity
    val sfBig = "/root/testdata/sf0.1"
    val fp = TextQueries.queries("t4_fingerprint")(spark, sfBig).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    val q = TextQueries.queries("t2_quality_score")(spark, sfBig).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    val out = TextQueries.queries("d10_best_dedup")(spark, sfBig).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == fp.size)
    val groups = fp.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    assert(groups.values.exists(_.size > 1), "sf0.1 must contain dup groups")
    assert(out.length == groups.size)
    out.foreach { r =>
      val kept = r.getAs[Long]("doc_id")
      val members = groups(r.getAs[String]("fp"))
      assert(r.getAs[Long]("n_docs") == members.size)
      val best = members.maxBy(id => (q(id), -id))
      assert(kept == best, s"group ${r.getAs[String]("fp")} kept $kept, expected $best")
    }
  }

  test("u12 global shuffle: pos is a permutation ordered by the seeded hash") {
    val out = TextQueries.queries("u12_global_shuffle")(spark, sf).collect()
    val n = out.length
    assert(out.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to n.toLong))
    // the bucketed two-level rank equals a direct global (h, id) sort
    val expected = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getAs[Long]("doc_id"))
      .sortBy(id => (StableHash.stable60Local(s"shuf1:$id"), id)).toSeq
    val byPos = out.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("doc_id")).toSeq
    assert(byPos == expected)
  }
}
