package graft.operators

import graft.SparkSpec

/** Recall gate for the approximate ANN paths: correctness of v2/v4 is
  * hash-checked against the oracle (they compute their approximation
  * deterministically), but an approximation can be deterministically BAD —
  * this spec pins the approximation QUALITY against the exact brute-force
  * baseline (v1) on the sf0.01 corpus, which (being sparse) is the
  * worst-case regime for LSH recall. */
class AnnRecallSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private def topkPairs(query: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(query)(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-table multiprobe LSH ANN (v2) recall@5 >= 0.8 vs brute force") {
    val exact = topkPairs("v1_ann_cosine_topk")
    val lsh = topkPairs("v2_ann_lsh")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"v2 recall@5 = $recall")
  }

  test("int8-quantized ANN (v6) recall@5 >= 0.9 vs brute force") {
    val exact = topkPairs("v1_ann_cosine_topk")
    val quant = topkPairs("v6_ann_quantized")
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"v6 recall@5 = $recall")
  }

  test("trained-codebook IVF ANN (v4) recall@5 >= 0.8 vs brute force") {
    val exact = topkPairs("v1_ann_cosine_topk")
    val ivf = topkPairs("v4_ann_ivf")
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"v4 recall@5 = $recall")
  }

  test("product-quantization ANN (v10) recall@5 >= 0.8 vs brute force") {
    // PQ's 16x compression ranks coarser than v6's int8 (4x): measured
    // 0.54 with a 4·topK rerank pool, 0.86 with the 20·topK pool the
    // query ships — the deep-rerank trade PQ standardly makes
    val exact = topkPairs("v1_ann_cosine_topk")
    val pq = topkPairs("v10_ann_pq")
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"v10 recall@5 = $recall")
    assert(recall >= 0.8, s"v10 recall@5 = $recall")
  }

  test("IVFADC (v12) recall@5 >= 0.85 (v7's floor) vs brute force") {
    // the capstone composition: cell pruning's loss (v4/v7's regime)
    // compounds with PQ's coarse rank, bought back by probing one more
    // cell than v7 plus v10's deep 20·topK exact rerank — the gate is
    // v7's floor, per the design goal that composing the memory lever
    // must not cost recall vs the int8 serving shape
    val exact = topkPairs("v1_ann_cosine_topk")
    val ivfadc = topkPairs("v12_ann_ivfadc")
    val recall = (exact & ivfadc).size.toDouble / exact.size
    info(s"v12 recall@5 = $recall")
    assert(recall >= 0.85, s"v12 recall@5 = $recall")
  }

  test("quantized IVF ANN (v7) recall@5 >= 0.85 vs brute force") {
    // the composed serving shape loses recall ONLY to cell-probing (the
    // rerank cancels quantization error within probed cells), so its
    // floor sits between v4's cell-probe floor and v6's rerank ceiling
    val exact = topkPairs("v1_ann_cosine_topk")
    val composed = topkPairs("v7_ann_ivf_quantized")
    val recall = (exact & composed).size.toDouble / exact.size
    assert(recall >= 0.85, s"v7 recall@5 = $recall")
  }
}
