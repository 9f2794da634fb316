package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StableHash
import graft.operators.SimilarityOps
import graft.sources.Tables

/** Near-duplicate detection + similarity search over `documents` /
  * `embeddings` — the training-data-pipeline surface (MinHash-LSH,
  * SimHash, brute-force + LSH-bucketed ANN, embedding near-dup).
  *
  * Every pipeline is block→verify (see [[graft.operators.SimilarityOps]]);
  * the oracle SQL reproduces the exact same md5/universal-hash arithmetic
  * (see [[graft.functions.StableHash]]) and sequential-fold float math
  * (see [[graft.functions.VectorFunctions]]), so even the LSH bucket
  * assignments and cosine doubles hash-match DuckDB bit-for-bit.
  */
object SimilarityQueries {
  import CoreQueries.Q

  // Tuning shared by Spark + oracle. 16 minhash perms in 4 bands of 4
  // targets the jaccard~0.8 near-dup band; 4 hyperplanes → 16 ANN buckets.
  private val MinhashK = 16
  private val BandSize = 4
  private val ShingleN = 3
  private val JaccardThreshold = 0.8
  private val NPlanes = 4
  private val EmbedDim = 64
  private val TopK = 5
  private val NProbes = 10
  private val CosineThreshold = 0.4

  private val perms = StableHash.minhashParams(MinhashK)
  private val planes = StableHash.lshPlanes(NPlanes, EmbedDim)

  // v2 ANN tuning: 6 LSH tables × 6 sign bits with Hamming-1 in-band
  // multiprobe — measured recall@5 = 0.84 vs brute force at sf0.01 (the
  // sparse-corpus WORST case for LSH; the spec gates >= 0.8). v4 IVF
  // tuning: 16-cell codebook trained with 2 deterministic Lloyd's
  // iterations, 2-cell probing (measured recall@5 = 0.84).
  private val LshTables = 6
  private val LshBitsPerTable = 6
  private val planesAnn = StableHash.lshPlanes(LshTables * LshBitsPerTable, EmbedDim)
  private val KCells = 16
  private val KmeansIters = 2
  private val NProbeCells = 2
  // v7 probes one more cell than v4: its int8 cell scan costs 4× less
  // per candidate, so it spends the saving on candidates — measured
  // recall@5 0.84 (2 cells, v4's floor) → 0.90 (3 cells)
  private val V7ProbeCells = 3
  // v10 PQ tuning: 64 dims → 4 sub-blocks × 16 dims, 16 codewords per
  // block (m·k = 64 table entries per probe). PQ's rank is COARSE (16×
  // compression vs v6's 4×, and only 16^4 distinct reconstructions), so
  // it buys recall back with a DEEP exact rerank — 20·topK candidates
  // (~7% of the sf0.01 corpus; at production scale the pool stays
  // constant while the corpus grows, so the fraction vanishes):
  // measured recall@5 0.54 at a 4·topK pool → gated >= 0.8 at 20·topK
  private val PqM = 4
  private val PqSubDim = 16
  private val PqK = 16
  private val PqIters = KmeansIters
  private val PqRerank = 20 * TopK
  // v12 IVFADC: PQ's rank is coarser than v6's int8, so the composed
  // form probes one more cell than v7 (cell pruning's recall loss and
  // ADC's rank loss compound) and keeps v10's deep 20·topK rerank
  private val V12ProbeCells = 4
  // v13 hybrid RRF: k0=60 is the Cormack et al. standard; each arm
  // contributes its top-20 so fusion has depth beyond the final top-5
  private val RrfK0 = 60
  private val RrfArmK = 20

  // ---------------------------------------------------------------- queries

  /** Shared MinHash-LSH verified-pair pipeline: band-bucket candidates,
    * exact-Jaccard verify, never all-pairs. The shingle sets feed both
    * the signature and the verification, so they are computed once and
    * cached (bounded by documents-per-partition, not corpus size, so the
    * cache is safe at any scale). Feeds d3, d6 and c1. */
  private[queries] def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashPairsFrom(SimilarityOps.shingleSets(
      Tables.documents(s, d), col("doc_id"), col("text"), ShingleN))

  /** [[minhashPairs]] over a PREBUILT `(__id, __sh)` shingle frame — lets
    * a composed pipeline (CorpusReleaseApp) tokenize and shingle the
    * corpus ONCE and feed both the near-dup and the decontamination
    * stages. The shingle length must be [[shingleN]].
    *
    * Internals (r16, guide §2.3 "shuffle fewer bytes"): the string
    * shingles hash to 60-bit longs ONCE, and that hashed frame — 8
    * bytes per shingle instead of the shingle text — is what the
    * pipeline persists and what BOTH consumers (signature explode,
    * exact-Jaccard verify) read; band keys are the injectively PACKED
    * MinHash values (two longs), never md5 hex. The persisted frame is
    * per-document bounded, so the cache is safe at any corpus scale;
    * the bench harness clearCache()s it per run, long-lived sessions
    * inherit the same teardown duty the old string-set persist had. */
  private[graft] def minhashPairsFrom(sets: DataFrame): DataFrame = {
    val hsets = sets.select(col("__id"),
        transform(col("__sh"), sh => StableHash.stable60(sh)).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = SimilarityOps.minhashSignatureHashed(hsets, MinhashK)
    val bands = SimilarityOps.minhashBandsPacked(sig, MinhashK, BandSize)
    val pairs = SimilarityOps.pairsWithinBuckets(bands,
      SimilarityOps.packedSigKeys(BandSize))
    SimilarityOps.jaccardVerify(pairs, hsets, JaccardThreshold)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("jaccard"))
  }

  /** The shared-tuning shingle length (3-grams) — exposed so composed
    * pipelines build the ONE shingle frame both stages agree on. */
  private[graft] def shingleN: Int = ShingleN

  /** MinHash tuning accessors for composed pipelines (incremental
    * release) that must reproduce the EXACT band/verify parameters. */
  private[graft] def minhashK: Int = MinhashK
  private[graft] def bandSize: Int = BandSize
  private[graft] def jaccardThreshold: Double = JaccardThreshold

  /** D3 — MinHash-LSH near-dup pairs. */
  private val d3MinhashNeardup: Q = (s, d) =>
    minhashPairs(s, d).orderBy("doc_a", "doc_b")

  /** D6 — near-dup clustering: connected components over the verified
    * pair graph via min-label propagation TO FIXPOINT (each round one
    * join + one aggregation; rounds needed = component diameter, with a
    * convergence check so long chains are never split; no driver-side
    * graph). Runs on the pair-touched vertex set only; untouched
    * documents join back as singletons. */
  private val MaxPropagationRounds = 50
  private val d6DedupClusters: Q = (s, d) =>
    d6Labels(s, d).orderBy("doc_id")

  /** d6's labeled frame WITHOUT the final global sort — d11 consumes
    * the labels through a join + aggregate that destroy row order, so
    * routing it through the sorted d6 result paid a full range
    * exchange + sort of the corpus-sized label table for nothing (at
    * 100 TB that is an entire wasted global sort). One body serves
    * both: d6 adds its declared ORDER BY on top. */
  private def d6Labels(s: SparkSession, d: String): DataFrame = {
    val pairs = minhashPairs(s, d)
    // Materialize the edge list once — every propagation round references
    // it, and without the persist each round's plan would re-run the
    // whole MinHash pipeline (measured 20× slowdown).
    // pre-partitioned on the propagation join key: the cache's
    // HashPartitioning then serves every round's join without an
    // exchange (g1's discipline — only the label side moves per round)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("id")).distinct()
    // eager localCheckpoint truncates lineage each round — iterative
    // DataFrame algorithms otherwise stack plans exponentially (the
    // standard Pregel-style materialization step)
    var labels = nodes.withColumn("lbl", col("id")).localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged && round < MaxPropagationRounds) {
      // label side hinted shuffle_hash: the checkpointed label frame
      // has no stats, so the default plan sort-merge-joins — re-sorting
      // the cached edge list every round. A shuffled-hash build of the
      // narrow (id, lbl) side streams the edges sort-free (see g1).
      val prop = edges.join(labels.hint("shuffle_hash"),
          col("src") === col("id"))
        .select(col("dst").as("id"), col("lbl"))
      // carry each id's PREVIOUS label through the aggregate (__old: set on
      // the identity rows, null on propagated ones, min ignores nulls) so
      // convergence falls out of the already-materialized frame — no extra
      // join-per-round, just a scan of the checkpointed result
      val merged = labels.select(col("id"), col("lbl"), col("lbl").as("__old"))
        .unionByName(prop.withColumn("__old",
          lit(null).cast(prop.schema("lbl").dataType)))
        .groupBy("id").agg(min("lbl").as("lbl"), min("__old").as("__old"))
        .localCheckpoint(true)
      converged = merged.filter(col("lbl") < col("__old")).isEmpty
      labels = merged.drop("__old")
      round += 1
    }
    // never return silently-split components — a >50-diameter chain is a
    // data pathology the caller must see, not a truncated answer
    require(converged,
      s"d6 label propagation did not converge in $MaxPropagationRounds rounds")
    val singles = Tables.documents(s, d)
      .join(nodes, col("doc_id") === col("id"), "left_anti")
      .select(col("doc_id").as("id"), col("doc_id").as("lbl"))
    labels.unionByName(singles)
      .select(col("id").as("doc_id"), col("lbl").as("canonical_id"))
  }

  /** D4 — SimHash fingerprint groups (16-bit vocabulary fingerprint,
    * exact-equality variant; the near-dup search is [[d7SimhashHamming]]). */
  private val d4Simhash: Q = (s, d) =>
    SimilarityOps.simhash(Tables.documents(s, d), col("doc_id"), col("text"), 16)
      .groupBy("simhash")
      .agg(min(col("__id")).as("canonical_id"), count(lit(1)).as("n_docs"))
      .orderBy("canonical_id")

  /** D7 — SimHash NEAR-dup: 60-bit fingerprint (the full width of the
    * engine-portable stable60 hash), 4 bands × 15 bits, verify Hamming
    * <= 3 (lossless blocking: 3 < 4 bands ⇒ a qualifying pair always
    * shares a band). */
  private val SimhashBits = 60
  private val SimhashBands = 4
  private val MaxHamming = 3
  private val d7SimhashHamming: Q = (s, d) =>
    SimilarityOps.simhashNearDup(Tables.documents(s, d),
        col("doc_id"), col("text"), SimhashBits, SimhashBands, MaxHamming)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")

  /** V1 — brute-force cosine top-k (ANN correctness baseline). */
  private val v1AnnCosineTopk: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val probes = e.filter(col("vec_id") < NProbes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    SimilarityOps.annBruteForce(probes, e, TopK)
      .select(col("q_id"), col("vec_id"), col("rank").as("rnk"), col("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  /** V13 — hybrid retrieval: a lexical token-Jaccard arm over
    * `documents` and a dense cosine arm over `embeddings` (the tables
    * share the 0..n id space), each top-20, fused by reciprocal-rank
    * fusion (score = Σ 1/(60+rank); Cormack et al., SIGIR 2009). Both
    * arms are broadcast-probe single scans; the fusion join and final
    * rank act on ≤ 2·20 rows per probe, so the whole query is two
    * corpus scans + per-probe-constant fusion at any scale. */
  private val v13HybridRrf: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val dense = SimilarityOps.annBruteForce(
        e.filter(col("vec_id") < NProbes)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        e, RrfArmK)
      .select(col("q_id"), col("vec_id").as("id"), col("rank"))
    val lex = SimilarityOps.lexicalJaccardTopK(
        Tables.documents(s, d), col("doc_id") < NProbes, RrfArmK)
      .select(col("q_id"), col("doc_id").as("id"), col("rank"))
    SimilarityOps.rrfFuse(lex, dense, RrfK0, TopK)
      .select(col("q_id"), col("id").as("doc_id"), col("rnk"), col("rrf_score"))
      .orderBy("q_id", "rnk")
  }

  /** V2 — LSH-bucketed ANN (the 100 TB path: bucket, then search),
    * 6 tables × 6 sign bits, Hamming-1 in-band multiprobe. */
  private val v2AnnLsh: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val probes = e.filter(col("vec_id") < NProbes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    SimilarityOps.lshBucketAnn(probes, e, planesAnn, TopK,
        nTables = LshTables, multiprobe = 1)
      .select(col("q_id"), col("vec_id"), col("rank").as("rnk"), col("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  /** V4 — IVF ANN with a TRAINED codebook: deterministic k-means
    * (16 cells, 2 Lloyd's iterations, integer-scaled means so the oracle
    * reproduces them bit-for-bit), probes search their 2 nearest cells. */
  private val v4AnnIvf: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    // trained codebook feeds both the corpus assignment and the probe
    // cell search — persist so the 2-iteration training runs once
    val cb = SimilarityOps.kmeansCodebook(e, KCells, KmeansIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    SimilarityOps.ivfAnn(e, cb, col("vec_id") < NProbes, TopK,
        nprobe = NProbeCells)
      .select(col("q_id"), col("vec_id"), col("rank").as("rnk"), col("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  /** D5 — n-gram Jaccard near-dup with rarest-shingle blocking. */
  private val d5NgramJaccard: Q = (s, d) =>
    SimilarityOps.ngramJaccardNearDup(Tables.documents(s, d),
        col("doc_id"), col("text"), blockN = 5, shingleN = 2,
        threshold = 0.5)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** D12 — containment near-dup (|A∩B|/|A|, Broder): the asymmetric
    * metric that catches quotation/subset duplicates Jaccard misses.
    * d5's exact block stage (shared, so the candidate set is provably
    * identical), integer-ppm verify, either direction >= 50%. */
  private val d12Containment: Q = (s, d) =>
    SimilarityOps.ngramContainment(Tables.documents(s, d),
        col("doc_id"), col("text"), blockN = 5, shingleN = 2,
        thresholdPpm = 500000L)
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("contain_a_ppm"), col("contain_b_ppm"))
      .orderBy("doc_a", "doc_b")

  /** V5 — same contract as v1 but per-probe top-k computed by the bounded
    * TopK AGGREGATOR (map-side partial top-k) instead of a row_number
    * window; shares v1's oracle — proving the rewrite is exact. */
  private val v5AnnTopkAgg: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val probes = e.filter(col("vec_id") < NProbes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    SimilarityOps.annBruteForceAgg(probes, e, TopK)
      .select(col("q_id"), col("vec_id"), col("rank").as("rnk"), col("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  /** V6 — int8-quantized ANN: integer-dot candidate scan over 4×-smaller
    * codes, exact-cosine rerank of the top 2k per probe. */
  private val v6AnnQuantized: Q = (s, d) =>
    SimilarityOps.annQuantized(Tables.embeddings(s, d),
        col("vec_id") < NProbes, TopK, rerankK = 2 * TopK)
      .select(col("q_id"), col("vec_id"), col("rank").as("rnk"), col("cos_sim"))
      .orderBy("q_id", "rnk")

  /** V10 — product-quantization ANN: 4 sub-block codebooks, ADC lookup
    * scoring, exact rerank — the 16×-compression scale path beyond v6's
    * scalar quantization. */
  private val v10AnnPq: Q = (s, d) =>
    SimilarityOps.pqAnn(Tables.embeddings(s, d), col("vec_id") < NProbes,
        PqM, PqSubDim, PqK, PqIters, TopK, rerankK = PqRerank)
      .select(col("q_id"), col("vec_id"), col("rank").as("rnk"), col("cos_sim"))
      .orderBy("q_id", "rnk")

  /** V12 — IVFADC: the quantization CAPSTONE composing v4's trained
    * cells (the candidate-set lever) with v10's PQ codes (the 16×
    * memory lever) — a probe ADC-scans only its 4 nearest cells' codes
    * instead of the corpus, then the shared deep exact rerank. The
    * form FAISS ships as IndexIVFPQ. */
  private val v12AnnIvfPq: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cb = SimilarityOps.kmeansCodebook(e, KCells, KmeansIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    SimilarityOps.ivfPqAnn(e, cb, col("vec_id") < NProbes, PqM, PqSubDim,
        PqK, PqIters, TopK, rerankK = PqRerank, nprobe = V12ProbeCells)
      .select(col("q_id"), col("vec_id"), col("rank").as("rnk"), col("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  /** V7 — quantized IVF ANN: v4's trained cells cut candidates, v6's
    * int8 codes shrink the cell scan, exact rerank keeps it
    * oracle-exact — the composed 100 TB serving shape. */
  private val v7AnnIvfQuantized: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cb = SimilarityOps.kmeansCodebook(e, KCells, KmeansIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    SimilarityOps.ivfQuantizedAnn(e, cb, col("vec_id") < NProbes, TopK,
        nprobe = V7ProbeCells, rerankK = 2 * TopK)
      .select(col("q_id"), col("vec_id"), col("rank").as("rnk"), col("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  /** V8 — v7's search through the BATCH-probe plan: identical output,
    * but every probe-carrying join runs shuffled
    * (`broadcastProbes = false`) — the form for joining a table-sized
    * probe set against the index, where a broadcast build would not
    * fit the driver. Shares v7's oracle (same semantics by design). */
  private val v8AnnIvfBatch: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cb = SimilarityOps.kmeansCodebook(e, KCells, KmeansIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    SimilarityOps.ivfSearchCodes(
        SimilarityOps.ivfCodes(e, cb),
        SimilarityOps.ivfProbes(e, cb, col("vec_id") < NProbes, V7ProbeCells),
        e, col("vec_id") < NProbes, TopK, rerankK = 2 * TopK,
        broadcastProbes = false)
      .select(col("q_id"), col("vec_id"), col("rank").as("rnk"), col("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  /** D8 — substring-level exact dedup: per-document duplicated-span
    * load over 8-token sliding windows (Lee et al., arXiv:2107.06499).
    * Catches cross-document boilerplate the whole-document d1–d7
    * measures miss. */
  private val SpanW = 8
  private val d8SpanDedup: Q = (s, d) =>
    SimilarityOps.spanDedupStats(Tables.documents(s, d),
        col("doc_id"), col("text"), SpanW)
      .withColumnRenamed("__id", "doc_id")
      .orderBy("doc_id")

  /** D9 — semantic dedup (SemDeDup, arXiv:2303.09540): within-cluster
    * cosine pruning over the trained IVF codebook; a vector is a
    * semantic dup iff a smaller-id clustermate matches at ≥ the
    * threshold (deterministic keep-lowest representative). The byte-
    * level d1–d8 family cannot see paraphrases; this is the embedding-
    * space member of the dedup suite. */
  private val d9SemanticDedup: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cb = SimilarityOps.kmeansCodebook(e, KCells, KmeansIters)
    SimilarityOps.semanticDedup(e, cb, CosineThreshold)
      .orderBy("vec_id")
  }

  /** V3 — embedding near-dup pairs within LSH buckets. */
  private val v3EmbedNeardup: Q = (s, d) =>
    SimilarityOps.embeddingNearDup(Tables.embeddings(s, d), planes, CosineThreshold)
      .select(col("a").as("vec_a"), col("b").as("vec_b"), col("cos_sim"))
      .orderBy("vec_a", "vec_b")

  /** V9 — corpus cluster profile: every embedding assigned to its
    * nearest trained centroid (the IVF cell assignment reused as a
    * clustering operator — mixture curation / topic bucketing), profiled
    * per cluster. Output columns are all order-insensitive (counts,
    * min/max) so the profile is exactly reproducible. */
  private val v9ClusterProfile: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cb = SimilarityOps.kmeansCodebook(e, KCells, KmeansIters)
    SimilarityOps.clusterAssign(e, cb)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        min(col("vec_id")).as("min_vec"),
        max(col("vec_id")).as("max_vec"))
      .orderBy("cluster")
  }

  /** V11 — cluster-purity evaluation: per trained cell, the majority
    * label's share of members (exact ppm) plus the distinct-label count
    * — the standard clustering-quality readout when ground-truth labels
    * exist (here `embeddings.label`), and the mixture-audit a curation
    * pipeline runs after v9's profile. All integer algebra: the
    * majority rides `max(struct(cnt, -label))` (ties → lowest label,
    * total order), purity is `maj·10^6 div n`. Plan: one map-side cell
    * assignment (v9's zero-shuffle broadcast argmax), one
    * (cluster, label) partial-agg shuffle, then a tiny per-cluster
    * rollup of the |cells|×|labels| count frame. */
  private val v11ClusterPurity: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cb = SimilarityOps.kmeansCodebook(e, KCells, KmeansIters)
    val counts = SimilarityOps.clusterAssignWith(e, cb, "label")
      .groupBy("cluster", "label")
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy("cluster")
      .agg(sum(col("cnt")).as("n_vecs"),
        count(lit(1)).as("n_labels"),
        max(struct(col("cnt"), (-col("label")).as("nl"))).as("__m"))
      .select(col("cluster"), col("n_vecs"), col("n_labels"),
        (-col("__m.nl")).cast("int").as("maj_label"),
        col("__m.cnt").as("maj_cnt"))
      .withColumn("purity_ppm", expr("(maj_cnt * 1000000) div n_vecs"))
      .orderBy("cluster")
  }

  /** D11 — keep-BEST-copy NEAR-dup dedup: d10's quality-argmax survivor
    * rule applied to d6's connected components instead of exact-dup
    * groups — the production curation shape (near-dup clusters keep the
    * cleanest rendition, not the lowest id; cf. d10's scaladoc for the
    * why). Costs d6 + one doc_id join + one map-side-partial struct-max
    * aggregate: the argmax rides `max(struct(q, −doc_id))` so ties fall
    * to the lowest id deterministically, and no window or second
    * shuffle touches the cluster frame. Output is one row per cluster
    * (singletons included), so the result is corpus-sized only in the
    * degenerate all-singleton case the aggregate collapses map-side. */
  private val d11BestNeardup: Q = (s, d) => {
    val labels = d6Labels(s, d) // unsorted — the join below destroys order
    val q = Tables.documents(s, d).select(col("doc_id"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
    labels.join(q, "doc_id")
      .groupBy("canonical_id")
      .agg(max(struct(col("q"), (-col("doc_id")).as("nid"))).as("m"),
        count(lit(1)).as("n_docs"))
      .select(col("canonical_id"), (-col("m.nid")).as("keep_doc_id"),
        col("m.q").as("quality_score"), col("n_docs"))
      .orderBy("canonical_id")
  }

  val queries: Map[String, Q] = Map(
    "d3_minhash_neardup" -> d3MinhashNeardup,
    "d11_best_neardup" -> d11BestNeardup,
    "d4_simhash" -> d4Simhash,
    "d6_dedup_clusters" -> d6DedupClusters,
    "d5_ngram_jaccard" -> d5NgramJaccard,
    "d12_containment" -> d12Containment,
    "d7_simhash_hamming" -> d7SimhashHamming,
    "d8_span_dedup" -> d8SpanDedup,
    "d9_semantic_dedup" -> d9SemanticDedup,
    "v9_cluster_profile" -> v9ClusterProfile,
    "v11_cluster_purity" -> v11ClusterPurity,
    "v1_ann_cosine_topk" -> v1AnnCosineTopk,
    "v2_ann_lsh" -> v2AnnLsh,
    "v3_embed_neardup" -> v3EmbedNeardup,
    "v4_ann_ivf" -> v4AnnIvf,
    "v5_ann_topk_agg" -> v5AnnTopkAgg,
    "v6_ann_quantized" -> v6AnnQuantized,
    "v10_ann_pq" -> v10AnnPq,
    "v12_ann_ivfadc" -> v12AnnIvfPq,
    "v13_hybrid_rrf" -> v13HybridRrf,
    "v7_ann_ivf_quantized" -> v7AnnIvfQuantized,
    "v8_ann_ivf_batch" -> v8AnnIvfBatch)

  // ---------------------------------------------------------------- oracles

  /** DuckDB text normalization mirroring TextFunctions.normalized. */
  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** stable60 of a string expression (StableHash.stable60). */
  private def stable60Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** stable60 mod Mersenne-31 of a string expression (StableHash.stableMod). */
  private def stableModSql(e: String): String =
    s"(${stable60Sql(e)} % 2147483647)"

  /** Sequential-fold dot product — matches VectorFunctions.dot exactly
    * (DuckDB list_reduce folds left-to-right; 0.0 + x1 == x1). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE), (x, y) -> x + y)"

  private def cosineSql(a: String, b: String): String = {
    val na = s"sqrt(${dotSql(a, a)})"
    val nb = s"sqrt(${dotSql(b, b)})"
    s"(CASE WHEN $na = 0 OR $nb = 0 THEN 0.0 ELSE ${dotSql(a, b)} / ($na * $nb) END)"
  }

  private def planeSql(p: Seq[Double]): String =
    p.map(_.toLong).mkString("[", ", ", "]::DOUBLE[]")

  /** Sign-bit bucket string over fixed hyperplanes (signBits). */
  private def bucketSql(v: String, ps: Seq[Seq[Double]] = planes): String =
    ps.map(p =>
      s"(CASE WHEN ${dotSql(v, planeSql(p))} >= 0 THEN '1' ELSE '0' END)")
      .mkString("concat(", ", ", ")")

  /** Shared CTEs: distinct 3-gram shingles per doc. */
  private val shinglesCte =
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array($normSql, '\\s+') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, array_to_string(t[i:i+${ShingleN - 1}], ' ') AS s
       |    FROM (SELECT doc_id, t,
       |            unnest(generate_series(1, len(t) - ${ShingleN - 1})) AS i
       |          FROM toks)))""".stripMargin

  private val minhashCols = perms.zipWithIndex.map { case ((a, b), i) =>
    s"MIN(($a * h + $b) % 2147483647) AS mh$i"
  }.mkString(",\n    ")

  /** d3's band keys: the 4 MinHash values of a band packed INJECTIVELY
    * into two BIGINTs (mh < 2^31 ⇒ mh_a * 2^31 + mh_b < 2^62) — mirrors
    * [[SimilarityOps.minhashBandsPacked]]; the md5-of-concat form this
    * replaces hashed the identical tuple, so buckets are unchanged. */
  private val bandSelects = (0 until MinhashK / BandSize).map { bandIdx =>
    val m = (0 until BandSize).map(i => s"mh${bandIdx * BandSize + i}")
    s"SELECT doc_id, $bandIdx AS band, (${m(0)} * 2147483648 + ${m(1)}) AS sig1, " +
      s"(${m(2)} * 2147483648 + ${m(3)}) AS sig2 FROM mh"
  }.mkString("\n  UNION ALL\n  ")

  /** Bucket-capped candidate pairs from a `bands` CTE over the given
    * bucket-key columns — the shared block stage of every banded
    * near-dup oracle (d3, d5, d7), with the 1000-row flood cap
    * mirroring [[SimilarityOps.pairsWithinBuckets]]. */
  private def candCteOn(keys: Seq[String]): String = {
    val grp = keys.mkString(", ")
    val on = keys.map(k => s"l.$k = r.$k").mkString(" AND ")
    val bszOn = keys.map(k => s"l.$k = bsz.$k").mkString(" AND ")
    s"""bsz AS (SELECT $grp, COUNT(*) AS c FROM bands GROUP BY $grp),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON $on AND l.doc_id < r.doc_id
       |  JOIN bsz ON $bszOn
       |  WHERE bsz.c <= 1000)""".stripMargin
  }

  private val candCte = candCteOn(Seq("band", "sig"))

  /** Exact-Jaccard verification select over `cand` + `sets` — shared
    * by the d3 and d5 oracles (thresholds differ). */
  private def jaccardSelect(threshold: Double): String =
    s"""SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |    len(list_intersect(sa.l, sb.l))::DOUBLE
       |      / (len(sa.l) + len(sb.l) - len(list_intersect(sa.l, sb.l)))::DOUBLE
       |      AS jaccard
       |  FROM cand JOIN sets sa ON doc_a = sa.doc_id
       |            JOIN sets sb ON doc_b = sb.doc_id)
       |WHERE jaccard >= $threshold""".stripMargin

  /** The final per-probe rank select over a `scored` CTE carrying
    * (q_id, vec_id, cos_sim) — shared by the v1/v2/v4 oracles. */
  private val annRankTail =
    s"""SELECT q_id, vec_id, rnk, cos_sim FROM (
       |  SELECT q_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sim DESC, vec_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $TopK ORDER BY q_id, rnk""".stripMargin

  /** The verified-pair pipeline as a self-contained SELECT (nested CTEs) —
    * embeddable as a CTE body by d6/c1. */
  private[queries] val d3PairsCore =
    s"""WITH $shinglesCte,
       |hsh AS (
       |  SELECT doc_id, ${stable60Sql("s")} AS h60 FROM sh),
       |hv AS (
       |  SELECT doc_id, h60 % 2147483647 AS h FROM hsh),
       |mh AS (
       |  SELECT doc_id,
       |    $minhashCols
       |  FROM hv GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |${candCteOn(Seq("band", "sig1", "sig2"))},
       |sets AS (SELECT doc_id, list(DISTINCT h60) AS l FROM hsh GROUP BY doc_id)
       |${jaccardSelect(JaccardThreshold)}""".stripMargin

  private val d3Sql = s"$d3PairsCore\nORDER BY doc_a, doc_b"

  /** d6: exact connected components via recursive reachability — every
    * node collects the ids of all reachable nodes (UNION dedup terminates
    * the recursion), the component label is their minimum. Matches the
    * Spark side's propagation FIXPOINT for any component diameter. */
  private val d6Sql =
    s"""WITH RECURSIVE pairs AS ($d3PairsCore),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach(id, lbl) AS (
       |  SELECT DISTINCT src AS id, src AS lbl FROM edges
       |  UNION
       |  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
       |comp AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id),
       |singles AS (
       |  SELECT doc_id AS id, doc_id AS lbl FROM documents
       |  WHERE doc_id NOT IN (SELECT id FROM comp))
       |SELECT id AS doc_id, lbl AS canonical_id FROM (
       |  SELECT * FROM comp UNION ALL SELECT * FROM singles)
       |ORDER BY doc_id""".stripMargin

  private def simhashSums(bits: Int) = (0 until bits).map { j =>
    s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j"
  }.mkString(",\n    ")

  private def simhashFp(bits: Int) = (0 until bits).map { j =>
    s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)"
  }.mkString("(", " | ", ")")

  private val d4Sql =
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, t FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array($normSql, '\\s+')) AS t
       |    FROM documents)),
       |hv AS (
       |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
       |sums AS (
       |  SELECT doc_id,
       |    ${simhashSums(16)}
       |  FROM hv GROUP BY doc_id)
       |SELECT ${simhashFp(16)} AS simhash, MIN(doc_id) AS canonical_id,
       |  COUNT(*) AS n_docs
       |FROM sums GROUP BY 1 ORDER BY canonical_id""".stripMargin

  /** d7: same fingerprint construction at 60 bits, 4×15-bit band
    * blocking, popcount(xor) verification — mirrors
    * [[SimilarityOps.simhashNearDup]] including the 1000 bucket cap. */
  private val d7BandSelects = (0 until SimhashBands).map { b =>
    val shift = b * (SimhashBits / SimhashBands)
    val mask = (1L << (SimhashBits / SimhashBands)) - 1
    s"SELECT doc_id, $b AS band, ((f >> $shift) & $mask)::VARCHAR AS sig FROM fp"
  }.mkString("\n  UNION ALL\n  ")

  private val d7Sql =
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, t FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array($normSql, '\\s+')) AS t
       |    FROM documents)),
       |hv AS (
       |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
       |sums AS (
       |  SELECT doc_id,
       |    ${simhashSums(SimhashBits)}
       |  FROM hv GROUP BY doc_id),
       |fp AS (SELECT doc_id, ${simhashFp(SimhashBits)} AS f FROM sums),
       |bands AS (
       |  $d7BandSelects),
       |$candCte
       |SELECT doc_a, doc_b, hamming FROM (
       |  SELECT doc_a, doc_b,
       |    CAST(bit_count(xor(fa.f, fb.f)) AS INT) AS hamming
       |  FROM cand JOIN fp fa ON doc_a = fa.doc_id
       |            JOIN fp fb ON doc_b = fb.doc_id)
       |WHERE hamming <= $MaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  private val v1Sql =
    s"""WITH probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
       |  WHERE vec_id < $NProbes),
       |scored AS (
       |  SELECT q_id, vec_id,
       |    ${cosineSql("q_vec", "embedding")} AS cos_sim
       |  FROM embeddings CROSS JOIN probes WHERE q_id <> vec_id)
       |$annRankTail""".stripMargin

  /** v13 oracle: both arms rebuilt verbatim — lexical token-set Jaccard
    * (list_distinct + list_intersect mirror array_distinct +
    * array_intersect; |A∪B| derived as |A|+|B|−|A∩B| in the same
    * integer arithmetic) and v1's cosine — then the RRF sum in the same
    * fixed term order (lex + dense) so the doubles match bit-for-bit.
    * `1.0::DOUBLE` guards against DuckDB's DECIMAL literal division. */
  private val v13Sql =
    s"""WITH tok AS (
       |  SELECT doc_id, list_distinct(regexp_split_to_array($normSql, '\\s+')) AS tset
       |  FROM documents),
       |lprobes AS (
       |  SELECT doc_id AS q_id, tset AS q_set FROM tok WHERE doc_id < $NProbes),
       |lscored AS (
       |  SELECT q_id, doc_id AS id,
       |    CASE WHEN u = 0 THEN 0.0 ELSE i::DOUBLE / u END AS jaccard
       |  FROM (
       |    SELECT q_id, doc_id, i,
       |      CAST(len(q_set) AS BIGINT) + CAST(len(tset) AS BIGINT) - i AS u
       |    FROM (
       |      SELECT q_id, doc_id, q_set, tset,
       |        CAST(len(list_intersect(q_set, tset)) AS BIGINT) AS i
       |      FROM tok CROSS JOIN lprobes WHERE q_id <> doc_id))),
       |lex AS (
       |  SELECT q_id, id, rnk AS r_lex FROM (
       |    SELECT q_id, id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY jaccard DESC, id) AS rnk FROM lscored)
       |  WHERE rnk <= $RrfArmK),
       |dprobes AS (
       |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
       |  WHERE vec_id < $NProbes),
       |dscored AS (
       |  SELECT q_id, vec_id AS id, ${cosineSql("q_vec", "embedding")} AS cos_sim
       |  FROM embeddings CROSS JOIN dprobes WHERE q_id <> vec_id),
       |dense AS (
       |  SELECT q_id, id, rnk AS r_dense FROM (
       |    SELECT q_id, id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sim DESC, id) AS rnk FROM dscored)
       |  WHERE rnk <= $RrfArmK),
       |fused AS (
       |  SELECT coalesce(lex.q_id, dense.q_id) AS q_id,
       |    coalesce(lex.id, dense.id) AS id,
       |    coalesce(1.0::DOUBLE / ($RrfK0 + r_lex), 0.0)
       |      + coalesce(1.0::DOUBLE / ($RrfK0 + r_dense), 0.0) AS rrf_score
       |  FROM lex FULL OUTER JOIN dense
       |    ON lex.q_id = dense.q_id AND lex.id = dense.id)
       |SELECT q_id, id AS doc_id, rnk, rrf_score FROM (
       |  SELECT q_id, id, rrf_score,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY rrf_score DESC, id) AS rnk
       |  FROM fused)
       |WHERE rnk <= $TopK ORDER BY q_id, rnk""".stripMargin

  /** v6 oracle: mirrors annQuantized exactly — int8 codes via
    * round(x·127/max|x|), exact int64 candidate dot, dequantized rank
    * (same float-op order as the Spark column chain), top-2k rerank
    * with v1's cosine. The zero-vector guards (maxabs=0 → zero codes,
    * nb=0 → r=0) mirror the Spark side's — an unguarded division would
    * yield NaN here and diverge from Spark's r=0 convention. */
  private val v6Sql =
    s"""WITH qz AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs,
       |    sqrt(${dotSql("embedding", "embedding")}) AS nb,
       |    CASE WHEN list_max(list_transform(embedding, y -> abs(y::DOUBLE))) = 0
       |      THEN list_transform(embedding, x -> 0::BIGINT)
       |      ELSE list_transform(embedding,
       |        x -> CAST(round(x::DOUBLE * 127.0 / list_max(
       |          list_transform(embedding, y -> abs(y::DOUBLE)))) AS BIGINT))
       |    END AS qv
       |  FROM embeddings),
       |probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_vec, qv AS qa
       |  FROM qz WHERE vec_id < $NProbes),
       |cand AS (
       |  SELECT q_id, vec_id, q_vec, embedding,
       |    CASE WHEN nb = 0 THEN 0.0 ELSE
       |      (CAST(list_reduce(list_transform(list_zip(qa, qv),
       |          p -> p[1] * p[2]), (x, y) -> x + y) AS DOUBLE)
       |        * (maxabs / 127.0)) / nb END AS r
       |  FROM qz CROSS JOIN probes WHERE q_id <> vec_id),
       |top AS (
       |  SELECT q_id, vec_id, q_vec, embedding FROM (
       |    SELECT q_id, vec_id, q_vec, embedding,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY r DESC, vec_id) AS crnk
       |    FROM cand)
       |  WHERE crnk <= ${2 * TopK})
       |SELECT q_id, vec_id, rnk, cos_sim FROM (
       |  SELECT q_id, vec_id,
       |    ${cosineSql("q_vec", "embedding")} AS cos_sim,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY ${cosineSql("q_vec", "embedding")} DESC, vec_id) AS rnk
       |  FROM top)
       |WHERE rnk <= $TopK ORDER BY q_id, rnk""".stripMargin

  /** v2 oracle: the full 36-bit signature, split into 6 bands of 6; a
    * probe's search list per band = the band value + each single-bit
    * flip (Hamming-1 in-band multiprobe); pairs DISTINCT before ranking
    * (a pair can collide in several tables) — mirrors lshBucketAnn. */
  private val v2BandSelects = (0 until LshTables).map { t =>
    s"SELECT vec_id, $t AS tbl, substr(sig, ${t * LshBitsPerTable + 1}, " +
      s"$LshBitsPerTable) AS bucket FROM sigs"
  }.mkString("\n  UNION ALL\n  ")

  private val v2Variants = ("bucket" +: (0 until LshBitsPerTable).map { i =>
    s"concat(substr(bucket, 1, $i), " +
      s"CASE WHEN substr(bucket, ${i + 1}, 1) = '1' THEN '0' ELSE '1' END, " +
      s"substr(bucket, ${i + 2}, ${LshBitsPerTable - i - 1}))"
  }).mkString("[", ",\n    ", "]")

  private val v2Sql =
    s"""WITH sigs AS (
       |  SELECT vec_id, ${bucketSql("embedding", planesAnn)} AS sig
       |  FROM embeddings),
       |bands AS (
       |  $v2BandSelects),
       |pvar AS (
       |  SELECT vec_id AS q_id, tbl, unnest($v2Variants) AS bucket
       |  FROM bands WHERE vec_id < $NProbes),
       |cand AS (
       |  SELECT DISTINCT q_id, b.vec_id
       |  FROM bands b JOIN pvar USING (tbl, bucket)
       |  WHERE q_id <> b.vec_id),
       |scored AS (
       |  SELECT q_id, c.vec_id,
       |    ${cosineSql("q.embedding", "e.embedding")} AS cos_sim
       |  FROM cand c JOIN embeddings q ON c.q_id = q.vec_id
       |              JOIN embeddings e ON c.vec_id = e.vec_id)
       |$annRankTail""".stripMargin

  private val v3Sql =
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
       |  FROM embeddings)
       |SELECT vec_a, vec_b, cos_sim FROM (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${cosineSql("a.embedding", "b.embedding")} AS cos_sim
       |  FROM bucketed a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |WHERE cos_sim >= $CosineThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  /** v4 oracle: the deterministic k-means (integer-scaled means — an
    * exact, order-independent SUM both engines agree on) unrolled as one
    * CTE pair (assign aN, update cN) per Lloyd's iteration, then the
    * final assignment + 2-cell probe search. */
  private def v4AssignCte(name: String, from: String, cents: String,
                          keep: Int, probeFilter: String = ""): String =
    s"""$name AS (
       |  SELECT vec_id, embedding, cid AS cluster FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("e.embedding", "c.cvec")} DESC, c.cid) AS arn
       |    FROM $from e CROSS JOIN $cents c$probeFilter)
       |  WHERE arn <= $keep)""".stripMargin

  private def v4UpdateCte(name: String, assigned: String): String =
    s"""$name AS (
       |  SELECT cid, list(c ORDER BY pos) AS cvec FROM (
       |    SELECT cluster AS cid, pos,
       |      SUM(CAST(round(x::DOUBLE * 1000000) AS BIGINT))
       |        / COUNT(*) / 1000000.0 AS c
       |    FROM (SELECT cluster, unnest(embedding) AS x,
       |            generate_subscripts(embedding, 1) AS pos FROM $assigned)
       |    GROUP BY cluster, pos)
       |  GROUP BY cid)""".stripMargin

  private val v4IterCtes = (1 to KmeansIters).map { i =>
    v4AssignCte(s"a$i", "embeddings", s"c${i - 1}", keep = 1) + ",\n" +
      v4UpdateCte(s"c$i", s"a$i")
  }.mkString(",\n")

  /** v10's per-subspace training chains: the v4 builders run verbatim
    * on the SLICED corpus — one (c0 → assign/update × iters → final
    * encode) chain per sub-block, names suffixed s0..s3. */
  private def pqSlicedSql(s: Int): String =
    s"(SELECT vec_id, embedding[${s * PqSubDim + 1}:${(s + 1) * PqSubDim}]" +
      " AS embedding FROM embeddings)"

  private val pqCtes: String = (0 until PqM).map { s =>
    val c0 =
      s"""c0s$s AS (
         |  SELECT vec_id AS cid,
         |    list_transform(embedding, x -> x::DOUBLE) AS cvec
         |  FROM ${pqSlicedSql(s)} WHERE vec_id < $PqK)""".stripMargin
    val iters = (1 to PqIters).map { i =>
      v4AssignCte(s"a${i}s$s", pqSlicedSql(s), s"c${i - 1}s$s", keep = 1) +
        ",\n" + v4UpdateCte(s"c${i}s$s", s"a${i}s$s")
    }.mkString(",\n")
    val enc = v4AssignCte(s"encs$s", pqSlicedSql(s), s"c${PqIters}s$s",
      keep = 1)
    Seq(c0, iters, enc).mkString(",\n")
  }.mkString(",\n")

  /** The PQ middle CTEs shared by v10 (flat) and v12 (IVFADC): codebook
    * entries + norms, per-vector codes, reconstruction norms, and the
    * per-probe ADC tables — everything between training and scoring. */
  private val pqMidCtes =
    s"""cbents AS (
       |  ${(0 until PqM).map(s =>
            s"SELECT $s AS s, cid, cvec FROM c${PqIters}s$s")
           .mkString("\n  UNION ALL ")}),
       |cn AS (SELECT s, cid, sqrt(${dotSql("cvec", "cvec")}) AS nc
       |  FROM cbents),
       |codes AS (
       |  SELECT e0.vec_id,
       |    ${(0 until PqM).map(s => s"e$s.cluster AS c$s").mkString(", ")}
       |  FROM encs0 e0${(1 until PqM).map(s =>
            s" JOIN encs$s e$s ON e0.vec_id = e$s.vec_id").mkString}),
       |vn AS (
       |  SELECT codes.vec_id,
       |    sqrt(${(0 until PqM).map(s => s"n$s.nc * n$s.nc")
              .reduceLeft((a, b) => s"($a + $b)")}) AS vnorm
       |  FROM codes${(0 until PqM).map(s =>
            s" JOIN cn n$s ON n$s.s = $s AND n$s.cid = codes.c$s")
            .mkString}),
       |lut AS (
       |  SELECT q.vec_id AS q_id, cb.s, cb.cid,
       |    ${dotSql(
              s"q.embedding[cb.s * $PqSubDim + 1:(cb.s + 1) * $PqSubDim]",
              "cb.cvec")} AS dotv
       |  FROM (SELECT * FROM embeddings WHERE vec_id < $NProbes) q
       |  CROSS JOIN cbents cb)""".stripMargin

  /** The ADC scoring CTE: the sum in the same fixed parenthesization as
    * the Spark expression. `extraJoins` restricts the candidate set —
    * empty for v10's flat scan; v12 injects the cell-membership joins
    * (placed AFTER the lut joins: they reference l0.q_id). */
  private def pqScoredCte(extraJoins: String): String =
    s"""scored AS (
       |  SELECT l0.q_id, codes.vec_id,
       |    CASE WHEN vn.vnorm = 0 THEN 0.0 ELSE
       |      ${(0 until PqM).map(s => s"l$s.dotv")
              .reduceLeft((a, b) => s"($a + $b)")} / vn.vnorm END
       |      AS r
       |  FROM codes
       |  JOIN vn ON vn.vec_id = codes.vec_id
       |  JOIN lut l0 ON l0.s = 0 AND l0.cid = codes.c0${(1 until PqM)
            .map(s => s"\n  JOIN lut l$s ON l$s.s = $s AND l$s.cid" +
              s" = codes.c$s AND l$s.q_id = l0.q_id").mkString}$extraJoins
       |  WHERE l0.q_id <> codes.vec_id)""".stripMargin

  /** Rerank tail shared by the PQ family: top-`rerankK` by ADC rank,
    * exact-cosine rerank, final top-k. */
  private def pqTailSql(rerankK: Int): String =
    s"""top AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY r DESC, vec_id) AS crnk
       |    FROM scored)
       |  WHERE crnk <= $rerankK)
       |SELECT q_id, vec_id, rnk, cos_sim FROM (
       |  SELECT t.q_id, t.vec_id,
       |    ${cosineSql("q.embedding", "e.embedding")} AS cos_sim,
       |    row_number() OVER (PARTITION BY t.q_id
       |      ORDER BY ${cosineSql("q.embedding", "e.embedding")} DESC,
       |        t.vec_id) AS rnk
       |  FROM top t JOIN embeddings q ON t.q_id = q.vec_id
       |             JOIN embeddings e ON t.vec_id = e.vec_id)
       |WHERE rnk <= $TopK ORDER BY q_id, rnk""".stripMargin

  /** v10 oracle: per-subspace k-means replay, (s, cid)-matched codeword
    * lookups (never positional — a dropped codeword cannot shift
    * slots), the ADC sum in the same fixed parenthesization as the
    * Spark expression, exact-cosine rerank of the top 20·topK. */
  private val v10Sql =
    s"""WITH $pqCtes,
       |$pqMidCtes,
       |${pqScoredCte("")},
       |${pqTailSql(PqRerank)}""".stripMargin

  /** v12 oracle: v4's coarse k-means/assignment replay (the IVF half)
    * + v10's per-subspace chains (the PQ half); the scored CTE joins
    * each candidate's CELL against the probe's ${V12ProbeCells}-cell
    * search list, so the ADC scan is provably cell-local — then the
    * shared exact-cosine rerank tail. */
  private val v12Sql =
    s"""WITH c0 AS (
       |  SELECT vec_id AS cid,
       |    list_transform(embedding, x -> x::DOUBLE) AS cvec
       |  FROM embeddings WHERE vec_id < $KCells),
       |$v4IterCtes,
       |${v4AssignCte("assigned", "embeddings", s"c$KmeansIters", keep = 1)},
       |${v4AssignCte("pcells",
            s"(SELECT * FROM embeddings WHERE vec_id < $NProbes)",
            s"c$KmeansIters", keep = V12ProbeCells)},
       |$pqCtes,
       |$pqMidCtes,
       |${pqScoredCte(
         "\n  JOIN assigned ca ON ca.vec_id = codes.vec_id" +
         "\n  JOIN pcells pc ON pc.cluster = ca.cluster" +
         " AND pc.vec_id = l0.q_id")},
       |${pqTailSql(PqRerank)}""".stripMargin

  private val v4Sql =
    s"""WITH c0 AS (
       |  SELECT vec_id AS cid,
       |    list_transform(embedding, x -> x::DOUBLE) AS cvec
       |  FROM embeddings WHERE vec_id < $KCells),
       |$v4IterCtes,
       |${v4AssignCte("assigned", "embeddings", s"c$KmeansIters", keep = 1)},
       |${v4AssignCte("pcells", s"(SELECT * FROM embeddings WHERE vec_id < $NProbes)",
            s"c$KmeansIters", keep = NProbeCells)},
       |probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_vec, cluster FROM pcells),
       |scored AS (
       |  SELECT q_id, vec_id,
       |    ${cosineSql("q_vec", "embedding")} AS cos_sim
       |  FROM assigned JOIN probes USING (cluster) WHERE q_id <> vec_id)
       |$annRankTail""".stripMargin

  /** v7 oracle: v4's unrolled deterministic k-means + cell assignment,
    * v6's int8 quantization + exact int64 candidate dot (cell-local, not
    * corpus-wide), the dequantized rank, and the exact-cosine rerank —
    * the same fixed-order arithmetic as the Spark chain throughout. */
  private val v7Sql =
    s"""WITH c0 AS (
       |  SELECT vec_id AS cid,
       |    list_transform(embedding, x -> x::DOUBLE) AS cvec
       |  FROM embeddings WHERE vec_id < $KCells),
       |$v4IterCtes,
       |${v4AssignCte("assigned", "embeddings", s"c$KmeansIters", keep = 1)},
       |${v4AssignCte("pcells", s"(SELECT * FROM embeddings WHERE vec_id < $NProbes)",
            s"c$KmeansIters", keep = V7ProbeCells)},
       |qz AS (
       |  SELECT vec_id, cluster,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs,
       |    sqrt(${dotSql("embedding", "embedding")}) AS nv,
       |    CASE WHEN list_max(list_transform(embedding, y -> abs(y::DOUBLE))) = 0
       |      THEN list_transform(embedding, x -> 0::BIGINT)
       |      ELSE list_transform(embedding,
       |        x -> CAST(round(x::DOUBLE * 127.0 / list_max(
       |          list_transform(embedding, y -> abs(y::DOUBLE)))) AS BIGINT))
       |    END AS qv
       |  FROM assigned),
       |qprobes AS (
       |  SELECT p.vec_id AS q_id, p.cluster, z.qv AS qa
       |  FROM pcells p JOIN qz z ON p.vec_id = z.vec_id),
       |scored AS (
       |  SELECT q_id, z.vec_id,
       |    CASE WHEN z.nv = 0 THEN 0.0 ELSE
       |      (CAST(list_reduce(list_transform(list_zip(qa, z.qv),
       |          p -> p[1] * p[2]), (x, y) -> x + y) AS DOUBLE)
       |        * (z.maxabs / 127.0)) / z.nv END AS r
       |  FROM qz z JOIN qprobes USING (cluster) WHERE q_id <> z.vec_id),
       |${pqTailSql(2 * TopK)}""".stripMargin

  /** d5: 2-gram verify sets + two single-row minhash bands over 5-grams
    * (perms = the first two of the shared LCG family). */
  private val d5Perms = StableHash.minhashParams(2)
  /** The shared candidate chain (toks → 2-gram sets → 5-gram minhash
    * bands → bucket-capped pairs) — d5's final Jaccard select and d12's
    * containment select both read `cand` + `sets` off this prefix. */
  private val d5CteSql =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array($normSql, '\\s+') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, array_to_string(t[i:i+1], ' ') AS s
       |    FROM (SELECT doc_id, t,
       |            unnest(generate_series(1, len(t) - 1)) AS i
       |          FROM toks))),
       |sh5 AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, array_to_string(t[i:i+4], ' ') AS s
       |    FROM (SELECT doc_id, t,
       |            unnest(generate_series(1, len(t) - 4)) AS i
       |          FROM toks))),
       |hv5 AS (
       |  SELECT doc_id, ${stableModSql("s")} AS h FROM sh5),
       |mh AS (
       |  SELECT doc_id,
       |    MIN((${d5Perms(0)._1} * h + ${d5Perms(0)._2}) % 2147483647) AS mh0,
       |    MIN((${d5Perms(1)._1} * h + ${d5Perms(1)._2}) % 2147483647) AS mh1
       |  FROM hv5 GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, mh0 AS sig1 FROM mh
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, mh1 AS sig1 FROM mh),
       |${candCteOn(Seq("band", "sig1"))},
       |sets AS (SELECT doc_id, list(s) AS l FROM sh GROUP BY doc_id)""".stripMargin

  private val d5Sql =
    s"""$d5CteSql
       |${jaccardSelect(0.5)}
       |ORDER BY doc_a, doc_b""".stripMargin

  /** d12: same candidates; containment in exact ppm (len() is BIGINT in
    * DuckDB so the `//` floor matches Spark's `div` on the non-negative
    * operands), either direction >= 500000. */
  private val d12Sql =
    s"""$d5CteSql
       |SELECT doc_a, doc_b, contain_a_ppm, contain_b_ppm FROM (
       |  SELECT doc_a, doc_b,
       |    (len(list_intersect(sa.l, sb.l)) * 1000000) // len(sa.l)
       |      AS contain_a_ppm,
       |    (len(list_intersect(sa.l, sb.l)) * 1000000) // len(sb.l)
       |      AS contain_b_ppm
       |  FROM cand JOIN sets sa ON doc_a = sa.doc_id
       |            JOIN sets sb ON doc_b = sb.doc_id)
       |WHERE greatest(contain_a_ppm, contain_b_ppm) >= 500000
       |ORDER BY doc_a, doc_b""".stripMargin

  /** d8: 8-token spans hashed with the shared stableMod family; df ≥ 2
    * over distinct docs; left joins restore span-less documents. */
  private val d8Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array($normSql, '\\s+') AS t
       |  FROM documents),
       |spans AS (
       |  SELECT doc_id,
       |    ${stableModSql(s"array_to_string(t[i:i+${SpanW - 1}], ' ')")} AS h
       |  FROM (SELECT doc_id, t,
       |          unnest(generate_series(1, len(t) - ${SpanW - 1})) AS i
       |        FROM toks)),
       |dup AS (
       |  SELECT h FROM (
       |    SELECT h, COUNT(DISTINCT doc_id) AS df FROM spans GROUP BY h)
       |  WHERE df >= 2),
       |tot AS (SELECT doc_id, COUNT(*) AS total_spans FROM spans GROUP BY doc_id),
       |dups AS (
       |  SELECT doc_id, COUNT(*) AS dup_spans, COUNT(DISTINCT h) AS dup_distinct
       |  FROM spans JOIN dup USING (h) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(total_spans, 0::BIGINT) AS total_spans,
       |  coalesce(dup_spans, 0::BIGINT) AS dup_spans,
       |  coalesce(dup_distinct, 0::BIGINT) AS dup_distinct
       |FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN dups USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** d9: v4's deterministic unrolled k-means + nearest-cell assignment,
    * then the within-cluster smaller-id cosine match — the same
    * sequential-fold float math as the Spark chain, so the dup set is
    * bit-identical. */
  private val d9Sql =
    s"""WITH c0 AS (
       |  SELECT vec_id AS cid,
       |    list_transform(embedding, x -> x::DOUBLE) AS cvec
       |  FROM embeddings WHERE vec_id < $KCells),
       |$v4IterCtes,
       |${v4AssignCte("assigned", "embeddings", s"c$KmeansIters", keep = 1)},
       |dup AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM assigned a JOIN assigned b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= $CosineThreshold)
       |SELECT a.vec_id, a.cluster,
       |  CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS INT) AS is_dup
       |FROM assigned a LEFT JOIN dup d USING (vec_id)
       |ORDER BY vec_id""".stripMargin

  /** v9: v4's deterministic unrolled k-means + nearest-cell assignment,
    * profiled with order-insensitive aggregates only. */
  private val v9Sql =
    s"""WITH c0 AS (
       |  SELECT vec_id AS cid,
       |    list_transform(embedding, x -> x::DOUBLE) AS cvec
       |  FROM embeddings WHERE vec_id < $KCells),
       |$v4IterCtes,
       |${v4AssignCte("assigned", "embeddings", s"c$KmeansIters", keep = 1)}
       |SELECT cluster, COUNT(*) AS n_vecs,
       |  MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
       |FROM assigned GROUP BY cluster ORDER BY cluster""".stripMargin

  /** v11: v4's training/assignment replay + label join; the window's
    * (cnt DESC, label ASC) mirrors the Spark struct-max tie order. */
  private val v11Sql =
    s"""WITH c0 AS (
       |  SELECT vec_id AS cid,
       |    list_transform(embedding, x -> x::DOUBLE) AS cvec
       |  FROM embeddings WHERE vec_id < $KCells),
       |$v4IterCtes,
       |${v4AssignCte("assigned", "embeddings", s"c$KmeansIters", keep = 1)},
       |counts AS (
       |  SELECT a.cluster, e.label, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
       |  GROUP BY a.cluster, e.label),
       |r AS (
       |  SELECT cluster, label, cnt,
       |    ROW_NUMBER() OVER (PARTITION BY cluster
       |      ORDER BY cnt DESC, label ASC) AS rn,
       |    CAST(SUM(cnt) OVER (PARTITION BY cluster) AS BIGINT) AS n_vecs,
       |    CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT)
       |      AS n_labels
       |  FROM counts)
       |SELECT cluster, n_vecs, n_labels,
       |  CAST(label AS INTEGER) AS maj_label, cnt AS maj_cnt,
       |  (cnt * 1000000) // n_vecs AS purity_ppm
       |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin

  val oracles: Map[String, String] = Map(
    "v11_cluster_purity" -> v11Sql,
    "d3_minhash_neardup" -> d3Sql,
    "d4_simhash" -> d4Sql,
    "d7_simhash_hamming" -> d7Sql,
    "d5_ngram_jaccard" -> d5Sql,
    "d12_containment" -> d12Sql,
    "d6_dedup_clusters" -> d6Sql,
    // d11: d6's labels as a CTE + the shared t2 quality fragment; the
    // window-argmax mirrors the Spark struct-max's (q DESC, id ASC) order
    "d11_best_neardup" ->
      s"""WITH labels AS ($d6Sql),
         |q AS (SELECT doc_id, ${TextQueries.qSql} AS q FROM documents)
         |SELECT canonical_id, doc_id AS keep_doc_id, q AS quality_score,
         |  n_docs FROM (
         |  SELECT canonical_id, doc_id, q,
         |    ROW_NUMBER() OVER (PARTITION BY canonical_id
         |      ORDER BY q DESC, doc_id ASC) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT)
         |      AS n_docs
         |  FROM labels JOIN q USING (doc_id))
         |WHERE rn = 1 ORDER BY canonical_id""".stripMargin,
    "d8_span_dedup" -> d8Sql,
    "d9_semantic_dedup" -> d9Sql,
    "v9_cluster_profile" -> v9Sql,
    "v1_ann_cosine_topk" -> v1Sql,
    "v2_ann_lsh" -> v2Sql,
    "v3_embed_neardup" -> v3Sql,
    "v4_ann_ivf" -> v4Sql,
    "v5_ann_topk_agg" -> v1Sql, // same contract as v1 by construction
    "v6_ann_quantized" -> v6Sql,
    "v10_ann_pq" -> v10Sql,
    "v12_ann_ivfadc" -> v12Sql,
    "v13_hybrid_rrf" -> v13Sql,
    "v7_ann_ivf_quantized" -> v7Sql,
    // v8 is v7 through the shuffled batch-probe plan — same semantics,
    // same oracle; the DIFFERENCE under test is the physical plan,
    // gated by PlanAuditSpec and VectorIndexSpec's broadcast count
    "v8_ann_ivf_batch" -> v7Sql)
}
