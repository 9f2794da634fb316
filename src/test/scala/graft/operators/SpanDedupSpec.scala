package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SimilarityOps.spanDedupStats]] — substring-level exact dedup.
  * Hand-built corpus with a known cross-document span, a within-doc-only
  * repeat (must NOT count), and a document shorter than the window
  * (must survive with zeros). */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c d e"),         // spans(3): "a b c" "b c d" "c d e"
    (2L, "x b c d y"),         // shares "b c d" with docs 1 and 4
    (3L, "a b"),               // too short for w=3 -> zero spans
    (4L, "b c d b c d q"),     // "b c d" twice here AND cross-doc
    (5L, "p q r s p q r")      // "p q r" twice but ONLY here -> not dup
  ).toDF("doc_id", "text")

  private def stats = SimilarityOps
    .spanDedupStats(corpus, col("doc_id"), col("text"), w = 3)
    .collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    .toMap

  test("cross-document spans are counted per occurrence and per distinct span") {
    val got = stats
    assert(got(1L) == ((3L, 1L, 1L)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((3L, 1L, 1L)), s"doc 2: ${got(2L)}")
    assert(got(4L) == ((5L, 2L, 1L)), s"doc 4: ${got(4L)}")
  }

  test("within-document-only repetition is not duplication") {
    assert(stats(5L) == ((5L, 0L, 0L)))
  }

  test("documents shorter than the window survive with zero spans") {
    assert(stats(3L) == ((0L, 0L, 0L)))
  }

  test("every input document appears exactly once") {
    assert(stats.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }
}
