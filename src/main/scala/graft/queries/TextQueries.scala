package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{StableHash, TextFunctions}
import graft.functions.TextFunctions._
import graft.operators.SimilarityOps
import graft.sources.Tables

/** Text-analysis operators over the `documents` table — the reference's
  * tokenizer UDTF surface (`util/SplitKeywordUDTF.java:19-34`) generalized
  * to the text toolkit a training-data pipeline needs: language-ID,
  * quality scoring, token counting, fingerprinting.
  *
  * Everything is built from codegen'd column functions — a single narrow
  * scan of (doc_id, text), no shuffle except the final ORDER BY (and the
  * token-count aggregation), so the per-document cost is pure map-side
  * compute that scales linearly to 100 TB.
  */
object TextQueries {
  import CoreQueries.Q

  /** U2/A2 — tokenize + count per token (the keyword-window pipeline,
    * cf. DwsTrafficSourceKeywordPageViewWindow.java:52-73). */
  private val u2TokenCount: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(tokens(normalized(col("text")))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("token_ct"))
      .orderBy(col("token_ct").desc, col("token"))

  /** U3 — CJK-aware token counting (the IK-divergence path of U2): CJK
    * ideographs isolate to unigram tokens before the whitespace split.
    * The driver corpus has no CJK text, so a fixed CJK suffix is appended
    * IN the query (same derivation on both engines) — without it this row
    * would never exercise the isolation path it exists to test. */
  private val u3CjkTokens: Q = (s, d) => {
    val t = concat(col("text"), lit(" 汉字分词测试"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(tokensWithCjk(t)).cast("long").as("n_tokens"),
        cjkCount(t).as("cjk_chars"))
      .orderBy("doc_id")
  }

  /** T1 — language identification by stopword + script evidence. */
  private val t1LangId: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        langId(col("text")).as("pred_lang"),
        langScore(col("text"), "en").as("en_evidence"),
        cjkCount(col("text")).as("cjk_chars"))
      .orderBy("doc_id")

  /** T2 — document quality scoring (length / stopword / punctuation
    * heuristics à la C4/Gopher rules). */
  private val t2QualityScore: Q = (s, d) => {
    val wc = wordCount(col("text"))
    val sw = stopwordCount(col("text"))
    val pc = punctCount(col("text"))
    val chars = length(col("text")).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"),
        wc.as("word_count"),
        chars.as("char_count"),
        (length(normalized(col("text"))).cast("double") / wc).as("avg_word_len"),
        sw.as("stopword_ct"),
        pc.as("punct_ct"),
        qualityScore(col("text")).as("quality_score"))
      .orderBy("doc_id")
  }

  /** T3 — token counting: whitespace words vs BPE-ish regex sub-tokens. */
  private val t3TokenStats: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        wordCount(col("text")).as("n_words"),
        size(regexTokens(col("text"))).cast("long").as("n_subtokens"))
      .orderBy("doc_id")

  /** T4 — document fingerprint: md5 over normalized text. */
  private val t4Fingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** D1 — exact dedup: group by fingerprint, keep canonical min(doc_id)
    * (the hash-groupBy exact path; generalizes A5 keep-first). */
  private val d1ExactDedup: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))
      .orderBy("canonical_id")

  /** D2 — bag-of-words dedup: same vocabulary set ⇒ same group. */
  private val d2BowDedup: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), bowSignature(col("text")).as("sig"))
      .groupBy("sig")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))
      .orderBy("canonical_id")

  /** C1 — end-to-end corpus cleaning: quality gate + length gate + exact
    * dedup (fingerprint canonical) + near-dup removal (MinHash-LSH
    * losers), the composition a real training-data pipeline runs. One
    * pass over documents plus the shared pair pipeline; the anti-join
    * against losers is broadcast-size (pairs are rare by construction). */
  private val c1CleanCorpus: Q = (s, d) =>
    cleanCorpusFrom(s, d,
      SimilarityQueries.minhashPairs(s, d).select(col("doc_b")).distinct())

  /** c1 with the near-dup loser set INJECTED — a composed pipeline
    * (CorpusReleaseApp) derives losers from a shared shingle frame so the
    * corpus is tokenized once, not once per stage. */
  private[graft] def cleanCorpusFrom(s: SparkSession, d: String,
                                     losers: DataFrame): DataFrame =
    cleanCorpusDocs(Tables.documents(s, d), losers)

  /** [[cleanCorpusFrom]] over an explicit documents frame — the
    * incremental release runs it over a DELTA only (its fp window then
    * spans the delta; canonicals vs the already-released base are
    * resolved by the caller against the fingerprint index). */
  private[graft] def cleanCorpusDocs(docs: DataFrame,
                                     losers: DataFrame): DataFrame = {
    docs
      // ALL text-derived columns are computed map-side up front, so
      // nothing downstream ever touches the document text (§2.3
      // "project before the exchange").
      .select(col("doc_id"),
        fingerprint(col("text")).as("fp"),
        langId(col("text")).as("pred_lang"),
        qualityScore(col("text")).as("quality_score"),
        wordCount(col("text")).as("wc"))
      // "keep only rows where doc_id == min(doc_id) over fp" IS a
      // min-struct aggregate (doc_id leads the struct, is unique, and
      // totally orders it): one groupBy with map-side partial
      // aggregation replaces the old window — whose exchange carried
      // every row (text included) and whose frame needed a sort. The
      // quality/length gates must stay AFTER canonical selection:
      // canon is the min doc_id over ALL docs sharing a fingerprint,
      // including low-quality ones.
      .groupBy("fp")
      .agg(min(struct(col("doc_id"), col("pred_lang"),
        col("quality_score"), col("wc"))).as("__m"))
      .select(col("__m.doc_id").as("doc_id"),
        col("__m.pred_lang").as("pred_lang"),
        col("__m.quality_score").as("quality_score"),
        col("__m.wc").as("wc"))
      .filter(col("quality_score") >= 0.5 && col("wc") >= 20)
      .join(losers, col("doc_id") === col("doc_b"), "left_anti")
      .select("doc_id", "pred_lang", "quality_score")
      .orderBy("doc_id")
  }

  /** Pair-overlap of corpus shingles against a STATIC benchmark shingle
    * frame `(bench_id, s)` — the decontamination core once the benchmark
    * side is fixed (streaming stage, incremental release). Returns
    * contaminated `(doc_id, bench_id, shared_ngrams)` pairs. */
  private[graft] def overlapAgainstBench(sh: DataFrame, bench: DataFrame,
                                         minOverlap: Int): DataFrame =
    sh.join(broadcast(bench), "s")
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minOverlap)

  /** C2 — benchmark decontamination: flag corpus documents sharing >= 3
    * distinct 3-gram shingles with any document of a (small) benchmark
    * set — the eval-set contamination check every training pipeline runs
    * before a data release.
    *
    * Scale shape: the benchmark side is eval-set-sized (KBs–MBs) and
    * BROADCAST after a document-frequency guard strips shingles common
    * across the corpus (a stop-n-gram in the benchmark would otherwise
    * join a constant fraction of a 100 TB corpus); the corpus side is
    * one scan + map-side broadcast join + one (doc, bench) count. At
    * production scale the n-gram length rises (8–13) — same plan. */
  /** Shared decontamination skeleton (c2 / c4 / the spec's no-Bloom
    * reference all parameterize this — one place owns the rare-shingle
    * guard and overlap semantics): distinct `shingleN`-gram shingles
    * per document, benchmark = docs with id % `benchMod` == 0 behind a
    * document-frequency guard (df ≤ 1000 keeps boilerplate shingles out
    * of the benchmark side), then `overlapJoin` decides HOW corpus
    * shingles meet benchmark shingles (broadcast rows, Bloom-prefiltered
    * shuffle, plain shuffle) — the join strategy is the only thing the
    * variants disagree on. */
  private[queries] def decontaminationOverlap(
      s: SparkSession, d: String, shingleN: Int, benchMod: Int,
      minOverlap: Int,
      overlapJoin: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val sh = SimilarityOps.shingleSets(
        Tables.documents(s, d), col("doc_id"), col("text"), shingleN)
      .select(col("__id").as("doc_id"),
        explode(array_distinct(col("__sh"))).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val res = decontaminationOverlapFrom(sh, benchMod, minOverlap, overlapJoin)
    // the persisted shingle frame serves three consumers inside ONE
    // returned plan (df-guard, benchmark side, corpus side), so a lazy
    // return has no safe unpersist point and the cache would leak
    // across a 119-query harness run (the g1 leak, c2/c4 flavor).
    // Same release shape as g1's fix: the RESULT is the contamination
    // report — pairs over the threshold, metadata-scale next to the
    // corpus — so eagerly materialize it (localCheckpoint blocks are
    // ContextCleaner-collected once unreferenced, unlike CacheManager
    // entries) and drop the shingle cache before returning
    val out = res.localCheckpoint(true)
    sh.unpersist()
    out
  }

  /** [[decontaminationOverlap]] over a PREBUILT (ideally persisted)
    * exploded `(doc_id, s)` distinct-shingle frame — lets a composed
    * pipeline share one tokenize+shingle pass with the near-dup stage. */
  private[graft] def decontaminationOverlapFrom(
      sh: DataFrame, benchMod: Int, minOverlap: Int,
      overlapJoin: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val rare = sh.groupBy("s")
      .agg(count(lit(1)).as("__df")).filter(col("__df") <= 1000).select("s")
    val bench = sh.filter(col("doc_id") % benchMod === 0)
      .select(col("doc_id").as("bench_id"), col("s"))
      .join(rare, "s") // df-guard on the benchmark side only
    overlapJoin(sh, bench)
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared_ngrams")) // sh is distinct per doc
      .filter(col("shared_ngrams") >= minOverlap)
      .orderBy("doc_id", "bench_id")
  }

  private val c2Decontaminate: Q = (s, d) =>
    decontaminationOverlap(s, d, shingleN = 3, benchMod = 37, minOverlap = 3,
      (sh, bench) => sh.join(broadcast(bench), "s"))

  /** C4 — decontamination when the benchmark is too big to broadcast as
    * ROWS: broadcast its Bloom-filter BITS instead. The filter (built by
    * a distributed treeAggregate, ~1.2 bytes/element at 1% fpp — MBs
    * where the row broadcast would be GBs) prefilters corpus shingles
    * map-side; survivors go through a SHUFFLED exact join. Bloom has no
    * false negatives and the exact join removes its false positives, so
    * the result is IDENTICAL to the no-filter pipeline (asserted in
    * `CorpusOpsSpec`) and the DuckDB oracle stays exact. The
    * `mightContain` probe is the one deliberate UDF on the batch
    * surface: a broadcast bitset lookup has no builtin Column form, and
    * its cost is a few hash probes per row. 4-gram shingles, bench =
    * doc_id % 29, overlap ≥ 2 (c2 is the broadcast-row form: 3-grams,
    * % 37, ≥ 3). */
  private val c4BloomDecontaminate: Q = (s, d) =>
    decontaminationOverlap(s, d, shingleN = 4, benchMod = 29, minOverlap = 2,
      (sh, bench) => {
        // expectedNumItems is the sizing knob: at 100 TB set it to the
        // (known) benchmark shingle count; oversizing only wastes bits.
        val bloom = bench.stat.bloomFilter("s", 200000L, 0.01)
        val bloomB = sh.sparkSession.sparkContext.broadcast(bloom)
        val mightContain =
          udf((x: String) => x != null && bloomB.value.mightContainString(x))
        sh.filter(mightContain(col("s")))
          .join(bench, "s") // no broadcast hint: the at-scale shuffled join
      })

  /** C6 — per-document contamination RATE: the fraction of a document's
    * distinct 3-gram shingles that appear anywhere in the benchmark
    * set, with a 20% flag threshold — the graded form of c2's boolean
    * verdict (real pipelines drop on "more than X% contaminated", not
    * on any single hit). Exact integer algebra: the rate is ppm via
    * `(hits · 10^6) div n_shingles`, so no float crosses the engines.
    *
    * Scale shape: the benchmark SHINGLE SET (distinct `s` over
    * eval-set-sized docs — KBs–MBs) rides a broadcast; the corpus side
    * is one scan + map-side left semi-probe + one `groupBy(doc_id)`
    * count. No df-guard here, deliberately: c2's guard protects the
    * (doc, bench) PAIR join from stop-shingle fan-out, but c6 joins
    * against the deduplicated set — each corpus shingle matches at most
    * once, so there is no fan-out to guard. Short docs (< 3 tokens)
    * have no shingles and re-enter via the left join as rate 0. */
  private val c6ContaminationRate: Q = (s, d) => {
    // NOT persisted: the two consumers below read DISJOINT doc_id
    // slices (bench %37==0 vs corpus %37<>0) whose filters push down to
    // the scan, so a cache would materialize every document's shingles
    // to serve each side a subset — strictly more work than the two
    // pushed-down passes, and the blocks would leak across the
    // 115-query harness run (no safe unpersist point: both reads happen
    // inside the returned plan's one execution)
    val sh = SimilarityOps.shingleSets(
        Tables.documents(s, d), col("doc_id"), col("text"), 3)
      .select(col("__id").as("doc_id"),
        explode(array_distinct(col("__sh"))).as("s"))
    val benchS = sh.filter(col("doc_id") % 37 === 0)
      .select("s").distinct().withColumn("__hit", lit(1))
    val rates = sh.filter(col("doc_id") % 37 =!= 0)
      .join(broadcast(benchS), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_contaminated"))
    Tables.documents(s, d).filter(col("doc_id") % 37 =!= 0).select("doc_id")
      .join(rates, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contam_ppm", when(col("n_shingles") > 0,
        expr("(n_contaminated * 1000000) div n_shingles")).otherwise(0L))
      .withColumn("flagged", col("contam_ppm") >= 200000)
      .orderBy("doc_id")
  }

  /** The exploded (doc_id, token) stream — ONE scan, the base of the
    * t9/t13 count-join scaffolds (their count frames differ on purpose:
    * t13 drops the empty pseudo-token a whitespace-only document
    * produces, t9 keeps historical behavior). */
  private def tokenStream(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(tokens(normalized(col("text")))).as("token"))

  /** T13 — integer unigram surprisal, the LM-perplexity quality proxy
    * of CCNet-class curation pipelines in exact-algebra form: per-token
    * surprisal ≈ -log2 p(token), quantized to whole bits via integer
    * floor-log2 — `length(conv(c, 10, 2)) - 1`, the BIT LENGTH of the
    * count, bit-exact on both engines where a float `log2` chain
    * diverges at power-of-two boundaries (Spark's log2 is
    * `log(x)/log(2)`, not correctly rounded). surprisal(token) =
    * bitlen(T) - bitlen(c) with T the corpus token total; per-document
    * mean surprisal in ppm-bits. High = rare/implausible tokens
    * (gibberish, OCR noise); low = boilerplate. The whole-bit
    * quantization is the documented accuracy trade for cross-engine
    * exactness — ranking power at the filter thresholds these
    * pipelines use survives 1-bit granularity.
    *
    * 100 TB shape: two-phase token counts compress the corpus to the
    * (sublinear) vocabulary; the count-frame join back onto the token
    * stream is left to Catalyst — broadcast while the vocabulary is
    * small, shuffled when it isn't (t9's shape; no forced hint that
    * would OOM the driver at an outsized vocab) — the total rides a
    * 1-row broadcast, and the per-doc rollup is one partial-agg
    * shuffle on doc_id. The empty pseudo-token a whitespace-only
    * document produces is dropped, so degenerate documents report
    * n_tokens = 0 (the left-join row) instead of the surprisal of ''. */
  private val t13Surprisal: Q = (s, d) => {
    val toks = tokenStream(s, d).filter(length(col("token")) > 0)
    val counts = toks.groupBy("token").agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum(col("__c")).as("__t"))
    val agg = toks.join(counts, "token")
      .crossJoin(broadcast(total))
      .withColumn("__bits",
        (length(conv(col("__t"), 10, 2))
          - length(conv(col("__c"), 10, 2))).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__bits")).as("sum_bits"))
    Tables.documents(s, d).select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"))
      .withColumn("mean_bits_ppm", when(col("n_tokens") > 0,
        expr("(sum_bits * 1000000) div n_tokens")).otherwise(0L))
      .orderBy("doc_id")
  }

  /** The deterministic split rule u4 defines and c5 audits:
    * stable60(doc_id) % 100 → 80/10/10 train/validation/test. ONE
    * definition per side (this for Spark, `splitSql` for the oracles)
    * so the leakage audit can never desynchronize from the split it
    * claims to audit. */
  private def splitOf(id: Column): Column = {
    val h = StableHash.bucket60(id.cast("string"), 100)
    when(h < 80, "train").when(h < 90, "validation").otherwise("test")
  }

  /** U4 — deterministic hash split (train/validation/test): the split of
    * a document is a pure function of its id ([[splitOf]]), so it is
    * reproducible across runs, engines, and re-shards — the property a
    * dataset split must have. Map-side only + one count agg. */
  private val u4HashSplit: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("split", splitOf(col("doc_id")))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(wordCount(col("text"))).as("n_words"))
      .orderBy("split")

  /** U5 — exact heavy-hitter tokens (> 0.1% of all token occurrences):
    * two-phase count (map-side combine) + a 1-row broadcast total; the
    * threshold is RELATIVE so the query is scale-free. The exact form is
    * preferred over a sketch while the vocabulary fits an aggregate —
    * which it does at any corpus size (vocab grows sublinearly). */
  private val u5HeavyTokens: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .select(explode(tokens(normalized(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("token_ct"))
    val total = counts.agg(sum(col("token_ct")).as("__n")) // no second scan
    counts.crossJoin(broadcast(total))
      .filter(col("token_ct") * 1000 > col("__n"))
      .select(col("token"), col("token_ct"))
      .orderBy(col("token_ct").desc, col("token"))
  }

  /** T5 — within-document repetition scoring (Gopher-style repetition
    * filters): duplicate-token fraction and duplicate-3-gram fraction.
    * Token/shingle arrays are materialized ONCE per row in their own
    * projection (the alias blocks CollapseProject from re-running the
    * tokenizer per reference). Pure map-side. */
  private val t5Repetition: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("__t", tokens(normalized(col("text"))))
      .withColumn("__g", TextFunctions.shinglesFromTokens(col("__t"), 3))
      .select(col("doc_id"),
        (lit(1.0) - size(array_distinct(col("__t"))).cast("double")
          / size(col("__t"))).as("dup_token_frac"),
        when(size(col("__g")) > 0,
          lit(1.0) - size(array_distinct(col("__g"))).cast("double")
            / size(col("__g"))).otherwise(0.0).as("dup_trigram_frac"))
      .orderBy("doc_id")

  /** T14 — Gopher-style COUNT-WEIGHTED repetition rules (Rae et al.,
    * arXiv:2112.11446 §A1.1): the character mass of the single most
    * frequent 2-gram as a fraction of the document's characters, and the
    * character mass of duplicated 5-grams (count ≥ 2) as a fraction of
    * all 5-gram occurrence mass. t5's distinct-ratio shape cannot
    * express these — "most frequent" and "mass of duplicated grams"
    * need PER-GRAM COUNTS, so this is the distributed two-phase form:
    * explode grams → groupBy (doc, n, gram) count (map-side combine
    * collapses within-doc repeats before the shuffle) → one per-doc
    * pivot agg. Gram mass counts every occurrence's characters
    * (overlaps included), a documented simplification of Gopher's
    * position-distinct character coverage.
    *
    * Tie-break for the top 2-gram: highest count, then lexicographically
    * LARGEST gram (Spark's struct max ⇔ the oracle's ORDER BY c DESC,
    * gram DESC), deterministic on both engines. */
  private val t14GopherRepetition: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .withColumn("__t", tokens(normalized(col("text"))))
      .select(col("doc_id"),
        length(array_join(col("__t"), " ")).cast("long").as("doc_chars"),
        col("__t"))
    val grams = base.select(col("doc_id"), col("doc_chars"),
      explode(concat(
        transform(TextFunctions.shinglesFromTokens(col("__t"), 2),
          g => struct(lit(2).as("n"), g.as("gram"))),
        transform(TextFunctions.shinglesFromTokens(col("__t"), 5),
          g => struct(lit(5).as("n"), g.as("gram"))))).as("g"))
      .select(col("doc_id"), col("doc_chars"),
        col("g.n").as("n"), col("g.gram").as("gram"))
    val counts = grams.groupBy("doc_id", "doc_chars", "n", "gram")
      .agg(count(lit(1)).as("c"))
      .withColumn("w", length(col("gram")).cast("long"))
    val perN = counts.groupBy("doc_id", "doc_chars", "n").agg(
      max(struct(col("c"), col("gram"))).as("top"),
      sum(col("c") * col("w")).as("mass"),
      sum(when(col("c") >= 2, col("c") * col("w")).otherwise(lit(0L)))
        .as("dup_mass"))
    val perDoc = perN.groupBy("doc_id", "doc_chars").agg(
      max(when(col("n") === 2, col("top"))).as("top2"),
      max(when(col("n") === 5, col("dup_mass"))).as("dup5_mass"),
      max(when(col("n") === 5, col("mass"))).as("mass5"))
    // left join restores docs with < 2 tokens (no grams at all)
    Tables.documents(s, d).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("top2.gram"), lit("")).as("top_2gram"),
        coalesce((col("top2.c") * length(col("top2.gram")).cast("long"))
          .cast("double") / col("doc_chars"), lit(0.0)).as("top2gram_frac"),
        coalesce(col("dup5_mass").cast("double") / col("mass5"), lit(0.0))
          .as("dup5gram_frac"))
      .orderBy("doc_id")
  }

  /** T6 — exact word-count deciles via the HISTOGRAM method: counts per
    * value (distributed groupBy, map-side combine) compress the corpus
    * to |distinct wc| rows; the cumulative-sum window then runs on that
    * compressed histogram, not the corpus — the scale-correct exact
    * quantile (a row_number over a global sort of all documents would
    * funnel 100 TB through one partition's sort). Decile d = the
    * smallest wc whose cumulative count reaches ceil(d·n/10). */
  /** The histogram-method exact deciles, shared by t6 and a18 (t10
    * keeps its own variant — it must carry `pos`/`n` through for the
    * sketch rank-interval check): counts per value compress the input
    * to |distinct value| rows, the cumulative-sum window runs on that
    * histogram, decile d = the smallest value whose cumulative count
    * reaches ⌈d·n/10⌉. */
  private[queries] def histogramDeciles(values: DataFrame, value: String,
                                        out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = values.groupBy(col(value)).agg(count(lit(1)).as("c"))
    // the window runs over the histogram (|distinct value| rows)
    val cum = hist.withColumn("cum", sum("c").over(Window.orderBy(value)))
    val total = hist.agg(sum(col("c")).as("n"))
    values.sparkSession.range(1, 10).toDF("decile")
      .crossJoin(broadcast(total))
      .withColumn("pos", expr("(decile * n + 9) div 10"))
      .join(cum, col("cum") >= col("pos"))
      .groupBy("decile")
      .agg(min(col(value)).as(out))
      .orderBy("decile")
  }

  private val t6LengthQuantiles: Q = (s, d) =>
    histogramDeciles(
      Tables.documents(s, d).select(wordCount(col("text")).as("wc")),
      "wc", "wc_decile")

  /** T10 — approximate deciles via the GK sketch (`approx_percentile`,
    * accuracy 100 ⇒ rank error ≤ N/100): the SKETCH twin of t6 — the
    * same relationship a14 has to a3. One pass, fixed-size mergeable
    * partials per partition, where t6's exact histogram carries
    * |distinct wc| rows (word counts compress superbly so both are
    * viable at 100 TB; the sketch wins when the value domain is dense —
    * float quality scores, latencies). Oracle-visible via the a14
    * INVARIANT pattern: exact deciles (t6's histogram method) plus
    * `within_eps` = the approx value's rank interval
    * [count(<v), count(≤v)] intersects [pos − εN, pos + εN] — DuckDB
    * computes the exact side and predicts constant TRUE; a broken
    * sketch path flips the boolean and fails the hash. */
  private val t10ApproxQuantiles: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.documents(s, d)
      .groupBy(wordCount(col("text")).as("wc"))
      .agg(count(lit(1)).as("c"))
    // bounded input: the global-order window runs over the compressed
    // histogram (t6's shape), never the corpus
    val cum = hist.withColumn("cum", sum("c").over(Window.orderBy("wc")))
    val total = hist.agg(sum(col("c")).as("n"))
    val exact = s.range(1, 10).toDF("decile")
      .crossJoin(broadcast(total))
      .withColumn("pos", expr("(decile * n + 9) div 10"))
      .join(cum, col("cum") >= col("pos"))
      .groupBy("decile", "pos", "n")
      .agg(min(col("wc")).as("wc_decile"))
    val approx = Tables.documents(s, d)
      .agg(percentile_approx(wordCount(col("text")),
        array((1 to 9).map(i => lit(i / 10.0)): _*), lit(100)).as("qs"))
      .select(posexplode(col("qs")))
      .select((col("pos") + 1).as("decile"), col("col").as("approx_wc"))
    // the approx value's exact rank interval, read off the cumulative
    // histogram (9 × |hist| conditional agg — histogram-sized)
    val bounds = cum.crossJoin(broadcast(approx))
      .groupBy("decile", "approx_wc")
      .agg(max(when(col("wc") < col("approx_wc"), col("cum"))).as("lo"),
        max(when(col("wc") <= col("approx_wc"), col("cum"))).as("hi"))
    exact.join(bounds, "decile")
      .select(col("decile"), col("wc_decile"),
        (coalesce(col("hi"), lit(0L))
            >= col("pos") - greatest(lit(1L), expr("n div 100")) &&
          coalesce(col("lo"), lit(0L))
            <= col("pos") + greatest(lit(1L), expr("n div 100")))
          .as("within_eps"))
      .orderBy("decile")
  }

  /** U6 — per-language top-5 tokens via the bounded TopK AGGREGATOR
    * (the per-group-top-k 100 TB shape: map-side partial top-k, ≤k rows
    * per group×partition reach the shuffle — same machinery as v5, here
    * over a string payload). */
  private val u6TopTokensPerLang: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .withColumn("pred_lang", langId(col("text")))
      .select(col("pred_lang"),
        explode(tokens(normalized(col("text")))).as("token"))
      .groupBy("pred_lang", "token").agg(count(lit(1)).as("c"))
    counts.groupBy("pred_lang")
      .agg(graft.functions.TopK.topKStr(5)(
        col("c").cast("double"), col("token")).as("top"))
      .select(col("pred_lang"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("pred_lang"), col("sc._2").as("token"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("sc._1").cast("long").as("token_ct"))
      .orderBy("pred_lang", "rnk")
  }

  /** T7 — PII redaction: emails and phone-shaped numbers masked with
    * typed placeholders, per-document redaction counts kept for audit —
    * the scrub step every corpus release runs. Pure map-side regex (the
    * corpus has no PII, so a deterministic PII suffix is appended
    * in-query — same derivation on both engines — or this row would
    * never exercise the masking it exists to test). */
  private val t7Redact: Q = (s, d) => {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val t = lower(concat(col("text"),
      lit(" contact john.doe@example.com or 555-123-4567")))
    Tables.documents(s, d)
      .select(col("doc_id"),
        // Column-form regexp_extract_all with lit() patterns: no SQL
        // string-literal unescaping pass, so the TLD `\.` stays a
        // literal dot and the counting regex is the replacement regex.
        size(regexp_extract_all(t, lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(t, lit(phoneRe), lit(0)))
          .cast("long").as("n_phones"),
        length(regexp_replace(regexp_replace(t, emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).cast("long").as("redacted_len"))
      .orderBy("doc_id")
  }

  /** C3 — provenance (source) blocklist: drop documents from blocked
    * sources, report surviving per-source counts — the
    * licensing/provenance gate of a corpus release. Blocklist is tiny ⇒
    * broadcast anti-join; one scan, one count agg. */
  private val c3SourceFilter: Q = (s, d) => {
    val blocked = s.createDataFrame(Seq(Tuple1("src3"), Tuple1("src7"),
      Tuple1("src13"))).toDF("blocked_source")
    Tables.documents(s, d)
      .join(broadcast(blocked),
        col("source") === col("blocked_source"), "left_anti")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(wordCount(col("text"))).as("n_words"))
      .orderBy("source")
  }

  /** T8 — per-document salient terms: top-3 tokens by tf-idf. The idf
    * is RATIONAL — score = (tf · 10^6) div df in exact int64 arithmetic
    * — because float `ln` is not bit-portable across engines and the
    * monotone rational weight ranks rare-term salience the same way.
    * The corpus-size factor of textbook tf·N/df is CONSTANT within a
    * document, so it cannot change any per-doc ranking and is omitted:
    * that keeps the score overflow-free at any corpus size (tf ≤ doc
    * length ⇒ tf·10^6 ≤ ~10^11 ≪ 2^63; with the N factor an ANSI-mode
    * job would overflow at planetary N·tf). Shape at 100 TB: two
    * partial-aggregated shuffles (tf by (doc, token), df by token) and
    * a per-doc window — no global sort until the bounded output. */
  private val t8Tfidf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(normalized(col("text")))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token"))
    tf.join(dfreq, "token")
      .withColumn("score", expr("(tf * 1000000) div df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("score"), col("rnk"))
      .orderBy("doc_id", "rnk")
  }

  /** T9 — mean inverse token frequency: a corpus-statistics quality
    * score (rare-vocabulary documents score high — the unigram-LM
    * surprisal stand-in that needs no float log). Exact integer
    * arithmetic end to end: rarity = avg over token OCCURRENCES of
    * (N_tokens · 10^3) div count(token). The 10^3 scale bounds
    * N·10^3 < 2^63 up to ~9·10^15 total tokens (hundreds of PB of
    * text) — 10^6 would ANSI-overflow within the op's own design
    * range — while keeping ≥ 3 significant digits even for a token
    * carrying 100% of the corpus. Token totals derive from the count
    * aggregate (no second corpus scan); the per-occurrence join is the
    * idf join every tf-idf pipeline already pays. */
  private val t9Rarity: Q = (s, d) => {
    val toks = tokenStream(s, d)
    val cnt = toks.groupBy("token").agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).as("n")) // no second scan
    toks.join(cnt, "token").crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("sum((n * 1000) div c) div count(1)").as("rarity"))
      .orderBy("doc_id")
  }

  /** T11 — bigram coherence: a fluency proxy scoring each document by
    * the average corpus-conditional frequency of its bigrams —
    * avg over bigram occurrences of (C₂(w₁w₂)·10^6 div C₁(w₁)), the
    * integer-exact MLE stand-in for an n-gram LM's mean transition
    * probability (T9's unigram rarity scores VOCABULARY; this scores
    * SEQUENCE plausibility — word-salad with common words fools t9 but
    * not t11). Two corpus count frames (unigrams, bigrams — both
    * map-side-partial aggregates over the one token scan) join back to
    * the bigram occurrences; exact integer arithmetic end to end
    * (safe while any single bigram count stays under ~9·10^12 — a
    * degenerate single-token corpus beyond that would need the t9-style
    * 10^3 scale). */
  private val t11BigramCoherence: Q = (s, d) => {
    val toks = Tables.documents(s, d).select(col("doc_id"),
      tokens(normalized(col("text"))).as("t"))
    val bi = toks.select(col("doc_id"),
        explode(shinglesFromTokens(col("t"), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val uni = toks.select(explode(col("t")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val big = bi.groupBy("bg").agg(count(lit(1)).as("c2"))
    val scored = bi.join(big, "bg").join(uni, "w1")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum((c2 * 1000000) div c1) div count(1)").as("coherence"))
    Tables.documents(s, d).select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("coherence"), lit(0L)).as("coherence"))
      .orderBy("doc_id")
  }

  /** U13 — fixed-window token chunking (window 64, stride 48 → 16-token
    * overlap): the context-window segmentation every RAG / pre-training
    * pipeline runs before embedding or packing (u10 packs whole docs
    * into sequences; this SPLITS docs into overlapping model-window
    * chunks). Pure map-side — tokenize once, explode the stride grid,
    * slice the token array per start — no shuffle except the final
    * presentation sort; chunk identity is the md5 of the joined token
    * slice, so downstream chunk-level dedup (the d1 family) composes
    * directly. Scales embarrassingly: output rows = Σ ceil(len/stride),
    * each row independent of every other. */
  private val ChunkStride = 48L
  private val ChunkWin = 64
  private val u13Chunk: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), tokens(normalized(col("text"))).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
    toks
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L), col("n") - 1, lit(ChunkStride))).as("start"))
      .select(col("doc_id"), expr(s"start div $ChunkStride").as("chunk_idx"),
        col("start").as("start_tok"),
        slice(col("t"), (col("start") + 1).cast("int"), lit(ChunkWin)).as("c"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("c")).cast("long").as("n_tokens"),
        md5(array_join(col("c"), " ")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** U14 — fixed-COUNT stratified sample: exactly min(k, n) documents
    * per source, chosen as the k smallest stable-hash keys — the
    * "exactly 20 eval docs per stratum" form (u8 is the RATE form; a
    * rate cannot promise a count). Deterministic and engine-portable:
    * the sample is a pure function of doc_id. Rides the bounded
    * [[graft.functions.TopK]] aggregator (map-side partial top-k, ≤k
    * rows per source×partition reach the shuffle — never a per-group
    * global sort); the hash folds to 2^48 so its negated double score
    * is EXACT (2^48 < 2^53) and the (key, doc_id) order matches the
    * oracle's integer sort bit-for-bit, mod-collisions tie-broken by
    * id on both sides. */
  private val u14FixedSample: Q = (s, d) => {
    val SampleDomain = 1L << 48
    val key = StableHash.stable60(col("doc_id").cast("string")) % SampleDomain
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), key.as("k"))
      .groupBy("source")
      .agg(graft.functions.TopK.topK(20)(
        -col("k").cast("double"), col("doc_id")).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rnk"),
        col("sc._2").as("doc_id"),
        (-col("sc._1")).cast("long").as("sample_key"))
      .orderBy("source", "rnk")
  }

  /** U15 — EXACT-quota train/validation/test split via largest-remainder
    * (Hamilton) allocation: each source gets floor quotas for 80/10/10
    * and the leftover units go to the splits with the largest
    * fractional remainders (ties broken by the declared split order), so
    * per-source counts are exactly n·p rounded — u4's hash split only
    * delivers proportions in EXPECTATION, and an eval set that must
    * hold "exactly 10% per source" cannot ride on expectation.
    * Documents then map to splits by their stable-hash rank within
    * source: ranks [1, q_train] → train, next q_val → validation, rest
    * → test. Fully integer, reproducible, engine-portable.
    *
    * 100 TB shape: the per-source rank is TWO-PHASE (u12's pattern
    * partitioned by source) — 32 hash-prefix buckets per source, a
    * broadcast (source × bucket) offset frame, and a row_number within
    * each (source, bucket) cell — so no source ever funnels through a
    * single partition's sort; the quota algebra runs on 3-row-per-
    * source frames and broadcasts. */
  private val u15QuotaSplit: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), StableHash.stable60(
        concat(lit("split2:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("bucket", expr("h div 36028797018963968")) // 2^55 → 32
    val cellCounts = docs.groupBy("source", "bucket")
      .agg(count(lit(1)).as("c"))
    // rank offset of each (source, bucket) cell — sources × 32 rows
    val offsets = cellCounts.withColumn("off",
      sum("c").over(Window.partitionBy("source").orderBy("bucket"))
        - col("c"))
    val bySource = cellCounts.groupBy("source").agg(sum("c").as("n"))
    val splitFrame = s.createDataFrame(Seq(
        ("train", 8, 0), ("validation", 1, 1), ("test", 1, 2)))
      .toDF("split", "wt", "ord")
    val wSrc = Window.partitionBy("source")
    val quotas = bySource.crossJoin(broadcast(splitFrame))
      .withColumn("fl", expr("(n * wt) div 10"))
      .withColumn("rem", expr("(n * wt) % 10"))
      .withColumn("rk", row_number().over(
        wSrc.orderBy(col("rem").desc, col("ord"))))
      .withColumn("quota", col("fl") +
        when(col("rk") <= col("n") - sum("fl").over(wSrc), 1L).otherwise(0L))
      .withColumn("lo",
        sum("quota").over(wSrc.orderBy("ord")) - col("quota"))
      .select(col("source").as("q_source"), col("split"),
        col("lo"), col("quota"))
    docs.join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("pos", col("off") + row_number().over(
        Window.partitionBy("source", "bucket").orderBy("h", "doc_id")))
      .join(broadcast(quotas), col("source") === col("q_source") &&
        col("pos") > col("lo") && col("pos") <= col("lo") + col("quota"))
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy("doc_id")
  }

  /** T12 — BM25 retrieval ranking (Robertson et al.; k1 = 6/5, b = 3/4
    * as exact rationals): top-5 documents per query term — the search/
    * ranking capability class (t8's tf-idf scores salience per doc;
    * this ranks docs for a QUERY). The rational k1/b fold the whole
    * per-term score into one division of deterministic operands —
    * with T = corpus token total and N = doc count,
    * `score = idf_scaled · 44·T·tf / (20·T·tf + 6·T + 18·len·N)`
    * (avgdl = T/N cleared from the denominator), idf_scaled the t8
    * rational `N·10^6 div df` — so both engines run the identical IEEE
    * expression tree and the result hash-matches bit-for-bit. Plan
    * shape: token scan filtered to the query terms BEFORE the tf
    * aggregate (the scan's explode feeds a pushable filter), df and
    * the 1-row corpus stats broadcast, lens joined on doc_id, and the
    * per-term top-5 rides the bounded [[graft.functions.TopK]]
    * aggregator — ≤k rows per term per partition reach the shuffle,
    * never a per-term global sort. */
  private val Bm25Terms = Seq("data", "join", "scan")
  private val t12Bm25: Q = (s, d) => {
    val lens = Tables.documents(s, d)
      .select(col("doc_id"), wordCount(col("text")).as("len"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("len")).as("t_tokens"))
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(normalized(col("text")))).as("token"))
      .filter(col("token").isin(Bm25Terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "token")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_scaled", expr("(n_docs * 1000000) div df"))
      .withColumn("score",
        col("idf_scaled") * (lit(44.0) * col("t_tokens") * col("tf")) /
          (lit(20.0) * col("t_tokens") * col("tf") + lit(6.0) * col("t_tokens")
            + lit(18.0) * col("len") * col("n_docs")))
    scored.groupBy("token")
      .agg(graft.functions.TopK.topK(5)(col("score"), col("doc_id")).as("top"))
      .select(col("token"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("token"), (col("pos") + 1).cast("int").as("rnk"),
        col("sc._2").as("doc_id"), col("sc._1").as("score"))
      .orderBy("token", "rnk")
  }

  /** T15 — BM25 ranked retrieval: the first 10 documents act as QUERIES
    * (their distinct tokens are the query terms) and every other
    * document is scored by the sum of t12's per-term BM25 contributions
    * over the terms it shares with the query — the full-text-search
    * operator t12's fixed-term scoring generalizes to. Top-5 per query.
    *
    * Plan shape is inverted-index probing: the (doc, token, tf) frame IS
    * the inverted index (at production scale it is materialized once,
    * not rebuilt per query); the tiny probe term set broadcasts, so only
    * the posting lists of query terms survive past the first join. The
    * per-(query, doc) score sum is a FLOAT fold in sorted-token order
    * (sort_array → aggregate), never a groupBy-sum whose partition
    * order would desync the doubles from the oracle; list length is
    * bounded by the query's term count. The 0.0 init is exact:
    * 0.0 + s == s for the positive scores BM25 yields. */
  private val t15Bm25Search: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val lens = docs.select(col("doc_id"), wordCount(col("text")).as("len"))
    // the postings frame feeds THREE consumers (the scored posting
    // join, the df aggregate, the query-term extraction); without the
    // persist each consumer's plan re-tokenizes and re-aggregates the
    // whole corpus (two full tokenize passes survived common-subtree
    // dedup — exchange reuse does not fire across the differing
    // pushed-filter variants). Bounded by the corpus's (doc, token)
    // domain — the inverted index a production deployment materializes.
    // No safe unpersist point before the lazy return (all three
    // consumers sit inside the one returned plan, like the c2 shingle
    // frame above); teardown is the CALLER's: the bench clearCache()s
    // per run, and a long-lived session embedding this query should do
    // the same or persist a real index (TextIndexApp) instead.
    val tf = docs
      .select(col("doc_id"), explode(tokens(normalized(col("text")))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val qterms = tf.filter(col("doc_id") < 10)
      .select(col("doc_id").as("q_id"), col("token"))
    bm25Rank(tf, qterms, df, lens, topK = 5)
      .orderBy("q_id", "rnk")
  }

  /** The BM25 scoring tail shared by t15 and the persistent
    * [[graft.apps.TextIndexApp]] — ONE definition of the per-term score
    * (t12's exact-rational algebra over tf/df/len and the corpus
    * stats), the sorted-token float fold, and the per-query rank, so
    * the served index can never drift from the oracle-gated query.
    * `postings` = (doc_id, token, tf); `qterms` = (q_id, token), tiny
    * by contract in the default broadcast mode (`broadcastTerms =
    * false` is the table-sized-probe batch mode — the term join runs
    * shuffled, v8's trade in lexical form); `df` = (token, df);
    * `lens` = (doc_id, len) — corpus stats derive from `lens` in one
    * agg. */
  private[graft] def bm25Rank(postings: DataFrame, qterms: DataFrame,
                              df: DataFrame, lens: DataFrame,
                              topK: Int,
                              broadcastTerms: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val termSide = if (broadcastTerms) broadcast(qterms)
      else qterms.hint("shuffle_hash") // never a driver broadcast build
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("t_tokens"))
    val contrib = postings.join(termSide, "token")
      .filter(col("doc_id") =!= col("q_id"))
      .join(df, "token")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_scaled", expr("(n_docs * 1000000) div df"))
      .withColumn("score",
        col("idf_scaled") * (lit(44.0) * col("t_tokens") * col("tf")) /
          (lit(20.0) * col("t_tokens") * col("tf") + lit(6.0) * col("t_tokens")
            + lit(18.0) * col("len") * col("n_docs")))
    contrib.groupBy("q_id", "doc_id")
      .agg(aggregate(sort_array(collect_list(struct(col("token"), col("score")))),
        lit(0.0), (acc, x) => acc + x.getField("score")).as("bm25"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("doc_id"), col("rnk"), col("bm25"))
  }

  /** U8 — stratified (per-source) hash sampling: each provenance source
    * gets its own deterministic keep-rate; a document survives iff its
    * content-hash bucket falls under the source's rate. This is the
    * corpus-curation downsampling knob (oversampled web crawl vs scarce
    * books). Rates here derive from the source name so the oracle can
    * reproduce them; in production they come from a config table (the
    * j5b pattern). Pure map-side filter — no shuffle, no state, scales
    * embarrassingly. */
  private val u8StratifiedSample: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("rate_pct",
        lit(20) + StableHash.stable60(col("source")) % 61)
      .withColumn("__h", StableHash.bucket60(col("doc_id").cast("string"), 100))
      .filter(col("__h") < col("rate_pct"))
      .select(col("doc_id"), col("source"), col("rate_pct"))
      .orderBy("doc_id")

  /** U9 — weighted corpus mixing by integer repetition: each source
    * carries an epoch factor (1–3, derived deterministically from the
    * source name; a config table in production) and every document is
    * emitted once per epoch — the upsampling half of data mixing
    * (downsampling is U8). `explode(sequence(...))` fans out map-side;
    * output size = Σ rep_s·n_s, no shuffle before the final sort. */
  private val u9WeightedMix: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("rep", lit(1) + StableHash.stable60(col("source")) % 3)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("rep"))).as("epoch"))
      .orderBy("doc_id", "epoch")

  /** U10 — token-budget sequence packing: assign documents to fixed
    * token-budget training sequences (budget 2048) by cumulative token
    * offset WITHIN a hash bucket — seq = floor(tokens-before / budget).
    * The bucket is the scale unit: packing needs an ordered running sum,
    * and partitioning the cumsum by `stable60(doc_id) % B` keeps every
    * window local to one partition — at 100 TB you raise B (buckets ≈
    * cluster parallelism), never pay a global sort. Emits per-sequence
    * doc/token counts (the shard manifest). */
  private val u10PackSequences: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        StableHash.bucket60(col("doc_id").cast("string"), 8).as("bucket"),
        wordCount(col("text")).as("wc"))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("bef", coalesce(sum(col("wc")).over(w), lit(0L)))
      .groupBy(col("bucket"), expr("bef div 2048").as("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("wc")).as("n_tokens"))
      .orderBy("bucket", "seq_id")
  }

  /** D10 — keep-BEST-copy exact dedup: d1 keeps the lowest id per
    * duplicate group; production curation keeps the highest-QUALITY
    * copy (duplicates share normalized content but differ in raw bytes —
    * casing, whitespace, punctuation noise — so their t2 quality scores
    * differ, and the cleanest rendition should survive). One scan, one
    * map-side-partial aggregate on the fingerprint (the argmax rides a
    * single struct-max — no window, no second shuffle): (quality,
    * −doc_id) struct ordering makes ties deterministic (lowest id). */
  private val d10BestDedup: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"),
        qualityScore(col("text")).as("q"))
      .groupBy("fp")
      .agg(max(struct(col("q"), (-col("doc_id")).as("nid"))).as("m"),
        count(lit(1)).as("n_docs"))
      .select((-col("m.nid")).as("doc_id"), col("fp"),
        col("m.q").as("quality_score"), col("n_docs"))
      .orderBy("doc_id")

  /** C5 — cross-split leakage audit: near-duplicate pairs that STRADDLE
    * a train/validation/test boundary — the standard pre-training gate
    * (a val/test document with a train near-dup inflates eval; c2/c4
    * audit against an EXTERNAL benchmark, this audits the corpus's own
    * split). Composes the shared MinHash-LSH verified-pair pipeline
    * (d3's block→verify, never all-pairs) with u4's deterministic
    * hash-split rule; the split tags are pure map-side functions of the
    * pair list, so c5 costs d3 + nothing. */
  private val c5SplitLeakage: Q = (s, d) => {
    SimilarityQueries.minhashPairs(s, d)
      .withColumn("split_a", splitOf(col("doc_a")))
      .withColumn("split_b", splitOf(col("doc_b")))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("split_a"), col("doc_b"), col("split_b"),
        col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** U11 — temperature-rebalanced source sampling (the multilingual /
    * multi-domain α-sampling rule, α = 1/2: rate_s ∝ n_s^α / n_s, so
    * oversampled sources are damped toward the α-power distribution —
    * Conneau & Lample's XLM recipe, standard for corpus mixing). U8's
    * rates are per-source CONSTANTS; here they derive from the corpus's
    * OWN statistics, which is what production mixing does. The budget
    * unit is TOKENS, not documents (mixing targets a token budget):
    * n_s = Σ token counts over the source. Integer-exact end to end so
    * the oracle hash-matches: w_s = ⌊√n_s⌋ (exact — n < 2^52 makes IEEE
    * sqrt+floor deterministic and engine-identical), target
    * t_s = ⌊N·w_s / Σw⌋ computed by Euclidean decomposition
    * (q·w + ⌊r·w/Σw⌋ with N = q·Σw + r) so the product N·w_s is never
    * materialized — t_s ≤ N and every intermediate stays < 2^63 while
    * Σw·max(w) < 2^63 and n_s < 9·10^12 tokens (the naive N·w form
    * overflows at corpus scale; DuckDB would raise, Spark would wrap
    * negative and silently drop the source). Keep-rate in ppm; keep iff
    * the document's stable 60-bit hash bucket falls under the rate.
    * Plan shape: TWO scans of documents — a (source, wc) stats pass
    * collapsed map-side to k rows, then the apply pass with the k-row
    * rates broadcast and a pure map-side filter; no data shuffle at
    * any size (the sort is the oracle contract). */
  private val u11TemperatureSample: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val w = docs.groupBy("source")
      .agg(sum(wordCount(col("text"))).as("n"))
      .withColumn("w", floor(sqrt(col("n"))))
    val tot = w.agg(sum(col("w")).as("denom"), sum(col("n")).as("total"))
    val rates = w.crossJoin(broadcast(tot))
      .withColumn("t",
        expr("(total div denom) * w + ((total % denom) * w) div denom"))
      .withColumn("rate_ppm",
        when(col("t") >= col("n"), lit(1000000L))
          .otherwise(expr("(t * 1000000) div n")))
      .select(col("source"), col("rate_ppm"))
    docs.join(broadcast(rates), "source")
      .filter(StableHash.bucket60(col("doc_id").cast("string"), 1000000)
        < col("rate_ppm"))
      .select(col("doc_id"), col("source"), col("rate_ppm"))
      .orderBy("doc_id")
  }

  /** U12 — deterministic seeded global shuffle rank WITHOUT a global
    * sort: the training-data ordering primitive (epoch shuffles must be
    * reproducible and resumable — position k of the permutation must be
    * answerable without re-sorting 100 TB). Rank in the permutation
    * ordered by h = stable60(seed ‖ doc_id): the hash is uniform on
    * [0, 2^60), so bucket = h div 2^(60-log₂B) is a BALANCED range
    * partition with no sampling pass (repartitionByRange would sample);
    * per-bucket counts collapse to ONE broadcast row, each row's offset
    * is a map-side fold over that array, and the rank window is
    * partition-local to its bucket. B = 32 here; at cluster scale B
    * rises to the parallelism target (2^14 buckets ⇒ a 2^14-entry
    * offset array — still one broadcast row). Total global order, zero
    * single-partition exchanges. */
  private val u12GlobalShuffle: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), StableHash.stable60(
        concat(lit("shuf1:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("bucket", expr("h div 36028797018963968")) // 2^55 → 32 buckets
    val counts = docs.groupBy("bucket").agg(count(lit(1)).as("c"))
      .agg(collect_list(struct(col("bucket"), col("c"))).as("bc")) // one row
    docs.crossJoin(broadcast(counts))
      .withColumn("off", aggregate(
        filter(col("bc"), e => e.getField("bucket") < col("bucket")),
        lit(0L), (acc, e) => acc + e.getField("c")))
      .withColumn("pos", col("off") + row_number().over(
        Window.partitionBy("bucket").orderBy("h", "doc_id")))
      .select(col("doc_id"), col("pos"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "t8_tfidf" -> t8Tfidf,
    "t9_rarity" -> t9Rarity,
    "t11_bigram_coherence" -> t11BigramCoherence,
    "t12_bm25" -> t12Bm25,
    "t15_bm25_search" -> t15Bm25Search,
    "u13_chunk" -> u13Chunk,
    "u14_fixed_sample" -> u14FixedSample,
    "u15_quota_split" -> u15QuotaSplit,
    "u8_stratified_sample" -> u8StratifiedSample,
    "u9_weighted_mix" -> u9WeightedMix,
    "u10_pack_sequences" -> u10PackSequences,
    "u11_temperature_sample" -> u11TemperatureSample,
    "u12_global_shuffle" -> u12GlobalShuffle,
    "c5_split_leakage" -> c5SplitLeakage,
    "d10_best_dedup" -> d10BestDedup,
    "c4_bloom_decontaminate" -> c4BloomDecontaminate,
    "c1_clean_corpus" -> c1CleanCorpus,
    "c2_decontaminate" -> c2Decontaminate,
    "c3_source_filter" -> c3SourceFilter,
    "c6_contamination_rate" -> c6ContaminationRate,
    "t13_surprisal" -> t13Surprisal,
    "t6_length_quantiles" -> t6LengthQuantiles,
    "t10_approx_quantiles" -> t10ApproxQuantiles,
    "t7_redact" -> t7Redact,
    "u6_top_tokens" -> u6TopTokensPerLang,
    "u2_token_count" -> u2TokenCount,
    "u3_cjk_tokens" -> u3CjkTokens,
    "u4_hash_split" -> u4HashSplit,
    "u5_heavy_tokens" -> u5HeavyTokens,
    "t5_repetition" -> t5Repetition,
    "t14_gopher_repetition" -> t14GopherRepetition,
    "t1_langid" -> t1LangId,
    "t2_quality_score" -> t2QualityScore,
    "t3_token_stats" -> t3TokenStats,
    "t4_fingerprint" -> t4Fingerprint,
    "d1_exact_dedup" -> d1ExactDedup,
    "d2_bow_dedup" -> d2BowDedup)

  // -- oracle SQL ----------------------------------------------------------

  /** DuckDB text normalization mirroring TextFunctions.normalized. */
  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  private def occSql(needle: String): String = {
    val pad = "(' ' || lower(text) || ' ')"
    s"CAST((length($pad) - length(replace($pad, '$needle', ''))) // ${needle.length} AS BIGINT)"
  }

  private def langScoreSql(lang: String): String =
    langStopwords(lang).map(occSql).mkString("(", " + ", ")")

  private val cjkSql =
    "CAST(length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT)"

  private val stopSql =
    langStopwords.values.flatten.toSeq.distinct.sorted.map(occSql).mkString("(", " + ", ")")

  private val wcSql =
    s"CAST(len(regexp_split_to_array($normSql, '\\s+')) AS BIGINT)"

  private val punctSql =
    "CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS BIGINT)"

  private val stable60Sql: String => String =
    c => s"('0x' || substr(md5($c), 1, 15))::BIGINT"

  /** The oracle half of [[splitOf]] — the ONE SQL definition of the
    * 80/10/10 split rule, shared by the u4 and c5 oracles. */
  private def splitSql(c: String): String =
    s"""CASE WHEN ${stable60Sql(s"CAST($c AS VARCHAR)")} % 100 < 80 THEN 'train'
       |     WHEN ${stable60Sql(s"CAST($c AS VARCHAR)")} % 100 < 90 THEN 'validation'
       |     ELSE 'test' END""".stripMargin

  /** The oracle half of TextFunctions.qualityScore — the ONE SQL
    * definition of the t2 quality heuristic, shared by the t2, c1, d10
    * and d11 oracles (a tweak in one place cannot desynchronize them). */
  private[queries] def qSql: String =
    s"""least($wcSql / 100.0, 1.0) * 0.5
       | + least($stopSql * 10.0 / $wcSql, 1.0) * 0.3
       | + (CASE WHEN $punctSql * 5 <= length(text) THEN 0.2 ELSE 0.0 END)""".stripMargin

  // -- shared oracle CTE fragments (one definition per idiom, so a
  //    tokenizer/shingle/langid fix lands in ONE place) -------------------

  /** `toks` CTE: per-doc token ARRAY — the array-form tokenize every
    * windowed oracle (shingles, chunks, bigrams) starts from. */
  private val toksArrCte =
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array($normSql, '\\s+') AS t
       |  FROM documents)""".stripMargin

  /** `toks` CTE: the exploded (doc_id, token) stream — the oracle half
    * of the tokenStream scaffold (t8/t9/t12). */
  private val toksStreamCte =
    s"""toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array($normSql, '\\s+')) AS token
       |  FROM documents)""".stripMargin

  /** `sh` CTE: DISTINCT (`n`+1)-token shingles per doc, reading `toks`
    * (the array form). `n` is the SLICE span (t[i:i+n]). */
  private def shCte(n: Int): String =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, array_to_string(t[i:i+$n], ' ') AS s
       |    FROM (SELECT doc_id, t,
       |            unnest(generate_series(1, len(t) - $n)) AS i
       |          FROM toks)))""".stripMargin

  /** The c2/c4 decontamination shape: rare-shingle guard, benchmark =
    * every `mod`-th doc, flag docs sharing ≥ `minShared` shingles. */
  private def decontamSql(span: Int, mod: Int, minShared: Int): String =
    s"""WITH $toksArrCte,
       |${shCte(span)},
       |rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 1000),
       |bench AS (
       |  SELECT doc_id AS bench_id, s FROM sh JOIN rare USING (s)
       |  WHERE doc_id % $mod = 0)
       |SELECT sh.doc_id, bench_id, COUNT(*) AS shared_ngrams
       |FROM sh JOIN bench USING (s)
       |WHERE sh.doc_id <> bench_id
       |GROUP BY sh.doc_id, bench_id
       |HAVING COUNT(*) >= $minShared
       |ORDER BY doc_id, bench_id""".stripMargin

  /** The five per-language evidence columns (t1's scoring). */
  private val langScoresSql =
    s"""${langScoreSql("en")} AS s_en, ${langScoreSql("de")} AS s_de,
       |  ${langScoreSql("es")} AS s_es, ${langScoreSql("fr")} AS s_fr,
       |  $cjkSql * 3 AS s_zh""".stripMargin

  /** The argmax-language CASE over the five evidence columns — ONE
    * definition shared by the t1, c1 and u6 oracles. */
  private val langCaseSql =
    """CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
      |      WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
      |      WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
      |      WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
      |      WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
      |      ELSE 'zh' END""".stripMargin

  val oracles: Map[String, String] = Map(
    "c4_bloom_decontaminate" -> decontamSql(span = 3, mod = 29, minShared = 2),
    "t8_tfidf" ->
      s"""WITH $toksStreamCte,
         |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM toks GROUP BY doc_id, token),
         |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
         |       FROM tf GROUP BY token)
         |SELECT doc_id, token, tf, df, score, rnk FROM (
         |  SELECT doc_id, token, tf, df,
         |    (tf * 1000000) // df AS score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY (tf * 1000000) // df DESC, token) AS INT) AS rnk
         |  FROM tf JOIN df USING (token))
         |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "t9_rarity" ->
      s"""WITH $toksStreamCte,
         |cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c
         |        FROM toks GROUP BY token),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM((n * 1000) // c) // COUNT(*) AS BIGINT) AS rarity
         |FROM toks JOIN cnt USING (token) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "u14_fixed_sample" ->
      s"""WITH h AS (
         |  SELECT source, doc_id,
         |    ${stable60Sql("CAST(doc_id AS VARCHAR)")} % 281474976710656 AS k
         |  FROM documents)
         |SELECT source, CAST(ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY k, doc_id) AS INT) AS rnk,
         |  doc_id, k AS sample_key
         |FROM h QUALIFY rnk <= 20 ORDER BY source, rnk""".stripMargin,
    // u15: plain per-source rank over the same hash (Spark's two-phase
    // bucket rank orders by (h div 2^55, h, doc_id) == (h, doc_id));
    // quotas replay the largest-remainder algebra on 3-row frames
    "u15_quota_split" ->
      s"""WITH h AS (
         |  SELECT doc_id, source,
         |    ${stable60Sql("'split2:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |n AS (SELECT source, COUNT(*) AS n FROM h GROUP BY source),
         |sp AS (SELECT * FROM (VALUES ('train', 8, 0),
         |  ('validation', 1, 1), ('test', 1, 2)) AS t(split, wt, ord)),
         |q0 AS (SELECT source, split, ord, n,
         |    (n * wt) // 10 AS fl, (n * wt) % 10 AS rem
         |  FROM n, sp),
         |q1 AS (SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY rem DESC, ord) AS rk,
         |    n - SUM(fl) OVER (PARTITION BY source) AS leftover
         |  FROM q0),
         |q2 AS (SELECT source, split, ord,
         |    fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS quota
         |  FROM q1),
         |q3 AS (SELECT source, split, quota,
         |    SUM(quota) OVER (PARTITION BY source ORDER BY ord) - quota
         |      AS lo
         |  FROM q2),
         |r AS (SELECT doc_id, source,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id)
         |      AS pos
         |  FROM h)
         |SELECT r.doc_id, r.source, q3.split
         |FROM r JOIN q3 ON r.source = q3.source
         |  AND r.pos > q3.lo AND r.pos <= q3.lo + q3.quota
         |ORDER BY r.doc_id""".stripMargin,
    "u13_chunk" ->
      s"""WITH $toksArrCte,
         |st AS (
         |  SELECT doc_id, t,
         |    unnest(generate_series(0, len(t) - 1, $ChunkStride)) AS start
         |  FROM toks)
         |SELECT doc_id, start // $ChunkStride AS chunk_idx,
         |  CAST(start AS BIGINT) AS start_tok,
         |  CAST(len(t[start + 1 : least(start + $ChunkWin, len(t))]) AS BIGINT)
         |    AS n_tokens,
         |  md5(array_to_string(
         |      t[start + 1 : least(start + $ChunkWin, len(t))], ' '))
         |    AS chunk_fp
         |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "t12_bm25" ->
      s"""WITH $toksStreamCte,
         |lens AS (SELECT doc_id, $wcSql AS len FROM documents),
         |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |                 CAST(SUM(len) AS BIGINT) AS t_tokens FROM lens),
         |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM toks WHERE token IN ('data', 'join', 'scan')
         |       GROUP BY doc_id, token),
         |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
         |       FROM tf GROUP BY token),
         |scored AS (
         |  SELECT token, doc_id,
         |    ((n_docs * 1000000 // df) * (44.0*t_tokens*tf))
         |      / (20.0*t_tokens*tf + 6.0*t_tokens + 18.0*len*n_docs) AS score
         |  FROM tf JOIN df USING (token) JOIN lens USING (doc_id)
         |  CROSS JOIN stats)
         |SELECT token, CAST(ROW_NUMBER() OVER (PARTITION BY token
         |    ORDER BY score DESC, doc_id ASC) AS INT) AS rnk, doc_id, score
         |FROM scored QUALIFY rnk <= 5 ORDER BY token, rnk""".stripMargin,
    // t15: t12's per-term score summed per (query, doc) in SORTED token
    // order (list(... ORDER BY token) + left fold == Spark's sort_array
    // + aggregate; DuckDB's init-less list_reduce starts at s1, Spark
    // folds 0.0+s1 — identical, 0.0 + s == s for positive scores)
    "t15_bm25_search" ->
      s"""WITH $toksStreamCte,
         |lens AS (SELECT doc_id, $wcSql AS len FROM documents),
         |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |                 CAST(SUM(len) AS BIGINT) AS t_tokens FROM lens),
         |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM toks GROUP BY doc_id, token),
         |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
         |       FROM tf GROUP BY token),
         |qterms AS (SELECT doc_id AS q_id, token FROM tf WHERE doc_id < 10),
         |contrib AS (
         |  SELECT q.q_id, tf.doc_id, tf.token,
         |    ((n_docs * 1000000 // df) * (44.0*t_tokens*tf))
         |      / (20.0*t_tokens*tf + 6.0*t_tokens + 18.0*len*n_docs) AS score
         |  FROM tf JOIN qterms q USING (token) JOIN df USING (token)
         |  JOIN lens ON lens.doc_id = tf.doc_id
         |  CROSS JOIN stats
         |  WHERE tf.doc_id <> q.q_id),
         |perdoc AS (
         |  SELECT q_id, doc_id,
         |    list_reduce(list(score ORDER BY token), (x, y) -> x + y) AS bm25
         |  FROM contrib GROUP BY q_id, doc_id)
         |SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
         |    ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rnk, bm25
         |FROM perdoc QUALIFY rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "t11_bigram_coherence" ->
      s"""WITH $toksArrCte,
         |bi AS (
         |  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS bg, t[i] AS w1
         |  FROM (SELECT doc_id, t,
         |          unnest(generate_series(1, len(t) - 1)) AS i FROM toks)),
         |uni AS (
         |  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
         |  FROM (SELECT unnest(t) AS w1 FROM toks) GROUP BY w1),
         |big AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2 FROM bi GROUP BY bg),
         |scored AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM((c2 * 1000000) // c1) // COUNT(*) AS BIGINT) AS coherence
         |  FROM bi JOIN big USING (bg) JOIN uni USING (w1)
         |  GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(n_bigrams, 0::BIGINT) AS n_bigrams,
         |  COALESCE(coherence, 0::BIGINT) AS coherence
         |FROM documents d LEFT JOIN scored USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "u8_stratified_sample" ->
      s"""SELECT doc_id, source, rate_pct FROM (
         |  SELECT doc_id, source,
         |    20 + ${stable60Sql("source")} % 61 AS rate_pct,
         |    ${stable60Sql("CAST(doc_id AS VARCHAR)")} % 100 AS h
         |  FROM documents)
         |WHERE h < rate_pct ORDER BY doc_id""".stripMargin,
    "u9_weighted_mix" ->
      s"""SELECT doc_id, source,
         |  CAST(unnest(generate_series(1, rep)) AS BIGINT) AS epoch FROM (
         |  SELECT doc_id, source,
         |    1 + ${stable60Sql("source")} % 3 AS rep
         |  FROM documents)
         |ORDER BY doc_id, epoch""".stripMargin,
    "c5_split_leakage" -> {
      s"""WITH pairs AS (${SimilarityQueries.d3PairsCore}),
         |tagged AS (
         |  SELECT doc_a, doc_b, jaccard,
         |    ${splitSql("doc_a")} AS split_a,
         |    ${splitSql("doc_b")} AS split_b
         |  FROM pairs)
         |SELECT doc_a, split_a, doc_b, split_b, jaccard
         |FROM tagged WHERE split_a <> split_b
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "u11_temperature_sample" ->
      s"""WITH cnt AS (
         |  SELECT source, CAST(SUM($wcSql) AS BIGINT) AS n
         |  FROM documents GROUP BY source),
         |w AS (SELECT source, n, CAST(FLOOR(SQRT(n)) AS BIGINT) AS w FROM cnt),
         |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS denom,
         |               CAST(SUM(n) AS BIGINT) AS total FROM w),
         |rates AS (
         |  SELECT source,
         |    CAST(CASE WHEN t >= n THEN 1000000
         |         ELSE (t * 1000000) // n END AS BIGINT) AS rate_ppm
         |  FROM (SELECT source, n,
         |          (total // denom) * w + ((total % denom) * w) // denom AS t
         |        FROM w CROSS JOIN tot))
         |SELECT doc_id, source, rate_ppm
         |FROM documents JOIN rates USING (source)
         |WHERE ${stable60Sql("CAST(doc_id AS VARCHAR)")} % 1000000 < rate_ppm
         |ORDER BY doc_id""".stripMargin,
    "u12_global_shuffle" ->
      s"""SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
         |FROM (SELECT doc_id,
         |        ${stable60Sql("'shuf1:' || CAST(doc_id AS VARCHAR)")} AS h
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "u10_pack_sequences" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    ${stable60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS bucket,
         |    $wcSql AS wc
         |  FROM documents),
         |c AS (
         |  SELECT bucket, wc,
         |    COALESCE(SUM(wc) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
         |  FROM d)
         |SELECT bucket, CAST(bef // 2048 AS BIGINT) AS seq_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(wc) AS BIGINT) AS n_tokens
         |FROM c GROUP BY bucket, seq_id ORDER BY bucket, seq_id""".stripMargin,
    "c1_clean_corpus" ->
      s"""WITH pairs AS (${SimilarityQueries.d3PairsCore}),
         |scored AS (
         | SELECT doc_id,
         |  $langScoresSql,
         |  $qSql AS quality_score,
         |  $wcSql AS wc,
         |  md5($normSql) AS fp
         | FROM documents),
         |canon AS (
         | SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS canon_id FROM scored)
         |SELECT doc_id,
         | $langCaseSql AS pred_lang,
         | quality_score
         |FROM canon
         |WHERE quality_score >= 0.5 AND wc >= 20 AND doc_id = canon_id
         | AND doc_id NOT IN (SELECT doc_b FROM pairs)
         |ORDER BY doc_id""".stripMargin,
    "u2_token_count" ->
      s"""SELECT token, COUNT(*) AS token_ct FROM (
         | SELECT unnest(regexp_split_to_array($normSql, '\\s+')) AS token
         | FROM documents)
         |GROUP BY token ORDER BY token_ct DESC, token""".stripMargin,
    "u6_top_tokens" ->
      s"""WITH sc AS (
         | SELECT doc_id, text,
         |  $langScoresSql
         | FROM documents),
         |lang AS (
         | SELECT text,
         |  $langCaseSql AS pred_lang
         | FROM sc),
         |c AS (
         | SELECT pred_lang, token, COUNT(*) AS c FROM (
         |  SELECT pred_lang,
         |    unnest(regexp_split_to_array($normSql, '\\s+')) AS token
         |  FROM lang)
         | GROUP BY pred_lang, token)
         |SELECT pred_lang, token, rnk, token_ct FROM (
         | SELECT pred_lang, token, CAST(c AS BIGINT) AS token_ct,
         |  CAST(row_number() OVER (PARTITION BY pred_lang
         |    ORDER BY c DESC, token) AS INT) AS rnk
         | FROM c)
         |WHERE rnk <= 5 ORDER BY pred_lang, rnk""".stripMargin,
    "t7_redact" -> {
      val t = "lower(text || ' contact john.doe@example.com or 555-123-4567')"
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
      s"""SELECT doc_id,
         | CAST(len(regexp_extract_all($t, '$email')) AS BIGINT) AS n_emails,
         | CAST(len(regexp_extract_all($t, '$phone')) AS BIGINT) AS n_phones,
         | CAST(length(regexp_replace(regexp_replace($t,
         |   '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g')) AS BIGINT)
         |   AS redacted_len
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "c3_source_filter" ->
      s"""SELECT source, COUNT(*) AS n_docs,
         | CAST(SUM($wcSql) AS BIGINT) AS n_words
         |FROM documents
         |WHERE source NOT IN ('src3', 'src7', 'src13')
         |GROUP BY source ORDER BY source""".stripMargin,
    "t6_length_quantiles" ->
      s"""WITH hist AS (
         |  SELECT wc, COUNT(*) AS c FROM (SELECT $wcSql AS wc FROM documents)
         |  GROUP BY wc),
         |cum AS (SELECT wc, SUM(c) OVER (ORDER BY wc) AS cum FROM hist),
         |tot AS (SELECT SUM(c) AS n FROM hist),
         |d AS (SELECT unnest(generate_series(1, 9)) AS decile)
         |SELECT decile, MIN(wc) AS wc_decile
         |FROM d CROSS JOIN tot CROSS JOIN cum
         |WHERE cum >= (decile * n + 9) // 10
         |GROUP BY decile ORDER BY decile""".stripMargin,
    // the GK estimate is engine-specific; the oracle checks the exact
    // deciles plus the rank-ε invariant the sketch must satisfy
    "t10_approx_quantiles" ->
      s"""WITH hist AS (
         |  SELECT wc, COUNT(*) AS c FROM (SELECT $wcSql AS wc FROM documents)
         |  GROUP BY wc),
         |cum AS (SELECT wc, SUM(c) OVER (ORDER BY wc) AS cum FROM hist),
         |tot AS (SELECT SUM(c) AS n FROM hist),
         |d AS (SELECT unnest(generate_series(1, 9)) AS decile)
         |SELECT decile, MIN(wc) AS wc_decile, TRUE AS within_eps
         |FROM d CROSS JOIN tot CROSS JOIN cum
         |WHERE cum >= (decile * n + 9) // 10
         |GROUP BY decile ORDER BY decile""".stripMargin,
    "c2_decontaminate" -> decontamSql(span = 2, mod = 37, minShared = 3),
    // c6: same 3-gram shingle frame as c2; hits counted against the
    // DISTINCT benchmark shingle set (each corpus shingle matches at
    // most once, so COUNT(b.s) over the left join is the hit count);
    // ppm via integer division — `//` floors but operands are >= 0, so
    // it equals Spark's truncating `div`
    "c6_contamination_rate" ->
      s"""WITH $toksArrCte,
         |${shCte(2)},
         |benchs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 37 = 0),
         |rates AS (
         |  SELECT c.doc_id, COUNT(*) AS n_shingles,
         |    COUNT(b.s) AS n_contaminated
         |  FROM sh c LEFT JOIN benchs b ON c.s = b.s
         |  WHERE c.doc_id % 37 <> 0
         |  GROUP BY c.doc_id)
         |SELECT d.doc_id,
         |  COALESCE(n_shingles, 0) AS n_shingles,
         |  COALESCE(n_contaminated, 0) AS n_contaminated,
         |  CASE WHEN COALESCE(n_shingles, 0) > 0
         |    THEN (COALESCE(n_contaminated, 0) * 1000000) // n_shingles
         |    ELSE 0 END AS contam_ppm,
         |  (CASE WHEN COALESCE(n_shingles, 0) > 0
         |    THEN (COALESCE(n_contaminated, 0) * 1000000) // n_shingles
         |    ELSE 0 END) >= 200000 AS flagged
         |FROM documents d LEFT JOIN rates ON d.doc_id = rates.doc_id
         |WHERE d.doc_id % 37 <> 0
         |ORDER BY d.doc_id""".stripMargin,
    // t13: same token fragment; bitlen via length(bin(x)) == Spark's
    // length(conv(x, 10, 2)); the count sum is cast back from HUGEINT
    // before bin() so both engines take the BIGINT rendering
    "t13_surprisal" ->
      s"""WITH tok AS (
         |  SELECT doc_id, token FROM (
         |    SELECT doc_id,
         |      unnest(regexp_split_to_array($normSql, '\\s+')) AS token
         |    FROM documents)
         |  WHERE token <> ''),
         |c AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM c),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(length(bin(t)) - length(bin(c.c)) AS BIGINT) AS bits
         |  FROM tok JOIN c USING (token), tot),
         |agg AS (
         |  SELECT doc_id, COUNT(*) AS n_tokens,
         |    CAST(SUM(bits) AS BIGINT) AS sum_bits
         |  FROM sc GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(n_tokens, 0) AS n_tokens,
         |  COALESCE(sum_bits, 0) AS sum_bits,
         |  CASE WHEN COALESCE(n_tokens, 0) > 0
         |    THEN (sum_bits * 1000000) // n_tokens ELSE 0 END
         |    AS mean_bits_ppm
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "u4_hash_split" ->
      s"""SELECT ${splitSql("doc_id")} AS split,
         | COUNT(*) AS n_docs, CAST(SUM($wcSql) AS BIGINT) AS n_words
         |FROM documents
         |GROUP BY split ORDER BY split""".stripMargin,
    "u5_heavy_tokens" ->
      s"""WITH c AS (
         |  SELECT token, COUNT(*) AS token_ct FROM (
         |    SELECT unnest(regexp_split_to_array($normSql, '\\s+')) AS token
         |    FROM documents)
         |  GROUP BY token),
         |tot AS (SELECT SUM(token_ct) AS n FROM c)
         |SELECT token, token_ct FROM c, tot
         |WHERE token_ct * 1000 > n
         |ORDER BY token_ct DESC, token""".stripMargin,
    "t5_repetition" ->
      s"""WITH $toksArrCte,
         |tri AS (
         |  SELECT doc_id, list(s) AS g FROM (
         |    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |    FROM (SELECT doc_id, t,
         |            unnest(generate_series(1, len(t) - 2)) AS i
         |          FROM toks))
         |  GROUP BY doc_id)
         |SELECT doc_id,
         | 1.0 - len(list_distinct(t))::DOUBLE / len(t) AS dup_token_frac,
         | CASE WHEN g IS NOT NULL AND len(g) > 0
         |      THEN 1.0 - len(list_distinct(g))::DOUBLE / len(g)
         |      ELSE 0.0 END AS dup_trigram_frac
         |FROM toks LEFT JOIN tri USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // t14: per-gram counts (2- and 5-grams), top-2-gram char mass over
    // doc chars, duplicated-5-gram mass over all 5-gram mass — the
    // count-weighted Gopher rules; tie-break c DESC, gram DESC mirrors
    // Spark's max(struct(c, gram))
    "t14_gopher_repetition" ->
      s"""WITH $toksArrCte,
         |base AS (
         |  SELECT doc_id,
         |    CAST(length(array_to_string(t, ' ')) AS BIGINT) AS doc_chars, t
         |  FROM toks),
         |grams AS (
         |  SELECT doc_id, 2 AS n, array_to_string(t[i:i+1], ' ') AS gram
         |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
         |        FROM base)
         |  UNION ALL
         |  SELECT doc_id, 5 AS n, array_to_string(t[i:i+4], ' ') AS gram
         |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
         |        FROM base)),
         |counts AS (
         |  SELECT doc_id, n, gram, COUNT(*) AS c,
         |    CAST(length(gram) AS BIGINT) AS w
         |  FROM grams GROUP BY doc_id, n, gram),
         |top2 AS (
         |  SELECT doc_id, gram, c, w FROM (
         |    SELECT doc_id, gram, c, w,
         |      row_number() OVER (PARTITION BY doc_id
         |        ORDER BY c DESC, gram DESC) AS rn
         |    FROM counts WHERE n = 2)
         |  WHERE rn = 1),
         |five AS (
         |  SELECT doc_id, SUM(c * w) AS mass,
         |    SUM(CASE WHEN c >= 2 THEN c * w ELSE 0 END) AS dup_mass
         |  FROM counts WHERE n = 5 GROUP BY doc_id)
         |SELECT b.doc_id,
         |  coalesce(t2.gram, '') AS top_2gram,
         |  coalesce((t2.c * t2.w)::DOUBLE / b.doc_chars, 0.0) AS top2gram_frac,
         |  coalesce(f.dup_mass::DOUBLE / f.mass, 0.0) AS dup5gram_frac
         |FROM base b
         |LEFT JOIN top2 t2 ON b.doc_id = t2.doc_id
         |LEFT JOIN five f ON b.doc_id = f.doc_id
         |ORDER BY b.doc_id""".stripMargin,
    "u3_cjk_tokens" -> {
      val t = "(text || ' 汉字分词测试')"
      val isolated = s"regexp_replace($t, '([\\x{4e00}-\\x{9fff}])', ' \\1 ', 'g')"
      val norm = s"trim(regexp_replace(lower($isolated), '\\s+', ' ', 'g'))"
      s"""SELECT doc_id,
         | CAST(len(regexp_split_to_array($norm, '\\s+')) AS BIGINT) AS n_tokens,
         | CAST(length($t) - length(regexp_replace($t,
         |   '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT) AS cjk_chars
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "t1_langid" ->
      s"""WITH scored AS (
         | SELECT doc_id,
         |  $langScoresSql, $cjkSql AS cjk_chars
         | FROM documents)
         |SELECT doc_id,
         | $langCaseSql AS pred_lang,
         | s_en AS en_evidence, cjk_chars
         |FROM scored ORDER BY doc_id""".stripMargin,
    "t2_quality_score" ->
      s"""SELECT doc_id,
         | $wcSql AS word_count,
         | CAST(length(text) AS BIGINT) AS char_count,
         | CAST(length($normSql) AS DOUBLE) / $wcSql AS avg_word_len,
         | $stopSql AS stopword_ct,
         | $punctSql AS punct_ct,
         | $qSql AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t3_token_stats" ->
      s"""SELECT doc_id, $wcSql AS n_words,
         | CAST(len(regexp_extract_all(text,
         |   '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_subtokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t4_fingerprint" ->
      s"""SELECT doc_id, md5($normSql) AS fp FROM documents ORDER BY doc_id""",
    "d10_best_dedup" ->
      s"""SELECT -(m.nid) AS doc_id, fp, m.q AS quality_score, n_docs FROM (
         |  SELECT fp, max(struct_pack(q := q, nid := -doc_id)) AS m,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM (SELECT doc_id, md5($normSql) AS fp,
         |          $qSql AS q
         |        FROM documents)
         |  GROUP BY fp)
         |ORDER BY doc_id""".stripMargin,
    "d1_exact_dedup" ->
      s"""SELECT md5($normSql) AS fp, MIN(doc_id) AS canonical_id,
         | COUNT(*) AS n_docs
         |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,
    "d2_bow_dedup" ->
      s"""SELECT md5(array_to_string(list_sort(list_distinct(
         |   regexp_split_to_array($normSql, '\\s+'))), ' ')) AS sig,
         | MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
         |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin)
}
