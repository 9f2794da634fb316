package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps

/** Constructed-input invariants for the round-9 additions that the
  * row-hash oracle cannot express as DESIGN checks: the RRF fusion
  * algebra on hand-built arms, the lexical arm's exact Jaccard, and
  * t14's Gopher fractions on documents with repetition planted by
  * construction (the oracle proves Spark==DuckDB; these prove both
  * compute the INTENDED number). */
class HybridRrfSpec extends SparkSpec {

  test("rrfFuse: dual-arm candidate outranks single-arm ties, scores exact") {
    import spark.implicits._
    // q=0: arm A ranks ids (1, 2); arm B ranks ids (2, 3).
    val armA = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("q_id", "id", "rank")
    val armB = Seq((0L, 2L, 1), (0L, 3L, 2)).toDF("q_id", "id", "rank")
    val out = SimilarityOps.rrfFuse(armA, armB, k0 = 60, topK = 5)
      .orderBy("rnk").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(2L, 1L, 3L))
    val scores = out.map(_.getAs[Double]("rrf_score")).toSeq
    assert(scores(0) == 1.0 / 62 + 1.0 / 61) // both arms
    assert(scores(1) == 1.0 / 61)            // A only, rank 1
    assert(scores(2) == 1.0 / 62)            // B only, rank 2
  }

  test("rrfFuse: score ties break by id ascending") {
    import spark.implicits._
    // id 9 is A-only rank 3; id 4 is B-only rank 3 — equal scores
    val armA = Seq((0L, 9L, 3)).toDF("q_id", "id", "rank")
    val armB = Seq((0L, 4L, 3)).toDF("q_id", "id", "rank")
    val out = SimilarityOps.rrfFuse(armA, armB, k0 = 60, topK = 5)
      .orderBy("rnk").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(4L, 9L))
  }

  test("lexicalJaccardTopK: exact set-Jaccard and deterministic ranks") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"),    // probe
      (1L, "c b a"),    // same set → jaccard 1.0
      (2L, "a b x y"),  // i=2, u=5 → 0.4
      (3L, "z z z"))    // i=0, u=4 → 0.0
      .toDF("doc_id", "text")
    val out = SimilarityOps.lexicalJaccardTopK(docs, col("doc_id") < 1, topK = 3)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("jaccard")))
      .toSeq == Seq((1L, 1.0), (2L, 0.4), (3L, 0.0)))
  }

  test("v13: per-probe ranks dense 1..5, scores bounded and nonincreasing") {
    val rows = SimilarityQueries.queries("v13_hybrid_rrf")(
      spark, "/root/testdata/sf0.001").collect()
    val byProbe = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byProbe.size == 10)
    byProbe.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to 5))
      val scores = sorted.map(_.getAs[Double]("rrf_score")).toSeq
      assert(scores.forall(x => x > 0.0 && x <= 1.0 / 61 + 1.0 / 61))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("t15: rare shared term outscores common shared term (idf ordering)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("t15docs").toString
    // doc 0 is the query ("rare common"); doc 1 shares the RARE term,
    // doc 2 the COMMON one (tf=1 and equal length both sides, so only
    // idf separates them); docs 3..8 inflate the common term's df
    val filler = (3L to 8L).map(i => (i, s"common pad${i}a pad${i}b", "en", "s", 0L))
    val rows = Seq(
      (0L, "rare common", "en", "s", 0L),
      (1L, "rare pad1a pad1b", "en", "s", 0L),
      (2L, "common pad2a pad2b", "en", "s", 0L)) ++ filler
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("t15_bm25_search")(spark, dir)
      .filter(col("q_id") === 0L).orderBy("rnk").collect()
    val ranked = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25")))
    assert(ranked.head._1 == 1L, s"rare-term doc must rank first: ${ranked.toSeq}")
    val byDoc = ranked.toMap
    assert(byDoc(1L) > byDoc(2L), "idf(rare) > idf(common) at equal tf and len")
    // every doc sharing a term is retrieved (7 share 'common', 1 'rare'
    // → 8 candidates, capped at top-5) and scores are positive
    assert(out.length == 5 && ranked.forall(_._2 > 0.0))
  }

  test("t14: Gopher fractions exact on planted repetition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("t14docs").toString
    Seq(
      // tokens x,y,x,y,x,y: top 2-gram "x y" ×3, chars 11 → 9/11;
      // both 5-grams unique → dup5 = 0
      (0L, "x y x y x y", "en", "s", 11L),
      // "a b c d e" ×3: all 11 5-grams have count ≥ 2 → dup5 = 1.0;
      // top 2-gram "a b" ×3 (tie with others broken to LARGEST gram:
      // "e a" ×2 < "d e" ×3 — counts first, so top is "d e"? no:
      // counts: "a b","b c","c d","d e" ×3 each, "e a" ×2 → tie on 3
      // broken by gram DESC → "d e", w=3, chars 29 → 9/29
      (1L, "a b c d e a b c d e a b c d e", "en", "s", 29L),
      // single token: no grams at all → empty gram, both fracs 0
      (2L, "solo", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("t14_gopher_repetition")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("top_2gram"), r.getAs[Double]("top2gram_frac"),
          r.getAs[Double]("dup5gram_frac")))).toMap
    assert(out(0L) == (("x y", 9.0 / 11, 0.0)))
    assert(out(1L) == (("d e", 9.0 / 29, 1.0)))
    assert(out(2L) == (("", 0.0, 0.0)))
  }
}
