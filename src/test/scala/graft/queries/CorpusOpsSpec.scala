package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.sources.Tables

/** Invariants of the round-4 corpus-curation ops that the row-hash
  * oracle cannot express: the Bloom prefilter's transparency, and the
  * packing/mixing conservation laws. sf0.001 keeps the suite fast; the
  * properties are scale-free. */
class CorpusOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("c4 bloom prefilter is transparent: result == exact pipeline without it") {
    val withBloom = TextQueries.queries("c4_bloom_decontaminate")(spark, sf)
    // same skeleton, same parameters, plain join with no Bloom stage
    val exact = TextQueries.decontaminationOverlap(
      spark, sf, shingleN = 4, benchMod = 29, minOverlap = 2,
      (sh, bench) => sh.join(bench, "s"))
    assert(withBloom.collect().toSeq == exact.collect().toSeq)
  }

  test("u10 packing conserves documents and tokens, sequences are contiguous") {
    val docs = Tables.documents(spark, sf)
    val packed = TextQueries.queries("u10_pack_sequences")(spark, sf).collect()
    val nDocs = docs.count()
    val nTokens = docs
      .agg(sum(TextFunctions.wordCount(col("text")))).head.getLong(0)
    assert(packed.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(packed.map(_.getAs[Long]("n_tokens")).sum == nTokens)
    // per bucket: seq ids run 0..max with no gaps (cumsum div is monotone)
    packed.groupBy(_.getAs[Long]("bucket")).foreach { case (_, rows) =>
      val seqs = rows.map(_.getAs[Long]("seq_id")).sorted
      assert(seqs.head == 0L && seqs.zipWithIndex.forall { case (s, i) => s == i })
    }
  }

  test("u9 mixing emits each document exactly its source's epoch count") {
    val mixed = TextQueries.queries("u9_weighted_mix")(spark, sf)
    val perDoc = mixed.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("epoch").as("maxe")).collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n == r.getAs[Long]("maxe"), "epochs must be 1..rep exactly once")
      assert(n >= 1 && n <= 3)
    }
    // same source ⇒ same repetition factor
    val perSource = perDoc.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n")).distinct).toMap
    perSource.foreach { case (src, reps) =>
      assert(reps.size == 1, s"$src has mixed repetition factors $reps")
    }
  }

  test("u8 sampling keeps a subset at the derived per-source rate bounds") {
    val kept = TextQueries.queries("u8_stratified_sample")(spark, sf).collect()
    assert(kept.nonEmpty && kept.length < Tables.documents(spark, sf).count())
    kept.foreach { r =>
      val rate = r.getAs[Long]("rate_pct")
      assert(rate >= 20 && rate <= 80)
    }
  }
}
