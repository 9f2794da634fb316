package graft.apps

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.SimilarityOps
import graft.queries.{SimilarityQueries, TextQueries}

/** INCREMENTAL corpus release — append a document delta to an existing
  * release without rescanning the base corpus.
  *
  * At 100 TB the corpus doesn't arrive once; it arrives as a daily
  * delta, and rebuilding the release from scratch per delta is the
  * operation that doesn't scale. This app keeps APPEND-ONLY sidecar
  * indexes next to the release and processes ONLY the delta against
  * them:
  *
  *   - `fps`      — fingerprints seen (exact-dedup gate: a delta doc
  *                  whose fp is already indexed can never be canonical),
  *                  partitioned by fp prefix;
  *   - `bands`    — every document's MinHash band signatures (near-dup
  *                  gate: delta candidates come from band-bucket
  *                  collisions against base ∪ delta), partitioned by a
  *                  sig prefix;
  *   - `shingles` — per-document shingle arrays (exact-Jaccard verify of
  *                  the rare candidates — the shingle index),
  *                  partitioned by doc-id bucket;
  *   (each index is directory-partitioned on the key its append-time
  *   read filters on, so every read prunes to the delta's own
  *   partitions at planning time);
  *   - `totals`   — per-(split, bucket) token totals (the packing cumsum
  *                  CONTINUES from them);
  *   - `meta`     — max doc_id released (monotonicity + replay guard).
  *
  * Equality guarantee (spec-asserted byte-for-byte):
  * `append(releaseAll(A), B) == releaseAll(A ∪ B)` whenever
  *   1. delta ids exceed all base ids (ingest order — `require`d), and
  *   2. no band bucket holding ≥ 2 base documents crosses the flood cap
  *      when the delta lands (`require`d; crossing would retroactively
  *      change base verdicts, which an append cannot do — rebuild).
  * Every downstream stage (sample/mix/split/pack) is a pure per-document
  * function, so base rows are FINAL: the append never rewrites a base
  * file, and all updates are parquet appends — O(delta) writes, and
  * O(delta) READS of the bands index (the other index reads are a
  * narrow fps column and the tiny totals/meta frames).
  *
  * Crash contract (spec-asserted): every append is STAGED first
  * (`<indexDir>/_staging`), then committed by moving the staged files
  * into place in one manifest-ordered pass with the `meta` marker LAST.
  * A crash before the manifest exists leaves nothing visible (the
  * staging is discarded and recomputed on replay); a crash mid-commit
  * is completed idempotently from the manifest on the next append; and
  * a delta whose ids are already covered by `meta` is a NO-OP — so a
  * replayed micro-batch HEALS a torn append instead of double-appending.
  * Single writer assumed (one stream / one operator per release), and
  * staging+release+index must share a filesystem (renames, not copies).
  *
  * The benchmark is FIXED (a real eval set does not grow with the
  * corpus) and passed in explicitly — its shingle length must match the
  * release's (require'd).
  */
object IncrementalReleaseApp {

  private val K = SimilarityQueries.minhashK
  private val B = SimilarityQueries.bandSize
  private val N = SimilarityQueries.shingleN
  private val Thresh = SimilarityQueries.jaccardThreshold
  private val Cap = 1000 // candidatePairs' flood cap (same constant)

  /** The bands and fps indexes are directory-partitioned by this many
    * leading hex chars of their md5 keys (2 → 256 directories): an
    * append collects the ≤ 256 prefixes its delta touches and prunes
    * each index scan to those directories at PLANNING time — the same
    * lever `retract` uses for split directories. */
  private val SigPrefixLen = 2

  /** The shingles index partitions by doc_id mod this: the exact-verify
    * stage reads only the buckets holding its base-side candidate ids
    * (collected as ≤ 64 literal values — never the ids themselves). */
  private val DocPartitions = 64

  // ------------------------------------------------------------ full build

  /** Batch build over `docs` + static benchmark: writes the release to
    * `outDir` and the sidecar indexes to `indexDir`. */
  def releaseAll(spark: SparkSession, docs: DataFrame,
                 bench: StreamingDecontamApp.Benchmark,
                 outDir: String, indexDir: String): Unit = {
    require(bench.shingleN == N,
      s"benchmark shingle length ${bench.shingleN} != release's $N")
    // a full rebuild overwrites everything — any torn append's staging
    // under this index is superseded, not healed
    val fs = fsFor(spark, indexDir)
    fs.delete(stagingPath(indexDir), true)
    val sets = SimilarityOps.shingleSets(docs, col("doc_id"), col("text"), N)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = SimilarityOps.lshBands(
      SimilarityOps.minhashSignature(sets, K), K, B)
    val losers = SimilarityOps.jaccardVerify(
        SimilarityOps.candidatePairs(bands, Cap), sets, Thresh)
      .select(col("b").as("doc_b")).distinct()
    val packed = packKept(docs, sets, losers, bench, baseTotals = None)
    CorpusReleaseApp.writeRelease(packed, outDir, mode = "overwrite")
    writeIndex(docs, sets, bands, packed, indexDir, mode = "overwrite")
    sets.unpersist()
  }

  // --------------------------------------------------------------- append

  /** Append `delta` to the release at `outDir` using ONLY the delta and
    * the sidecar indexes — the base corpus is not an input. Idempotent:
    * a delta already covered by the released max id no-ops (micro-batch
    * replay), and a torn previous append is healed first. */
  def append(spark: SparkSession, delta: DataFrame,
             bench: StreamingDecontamApp.Benchmark,
             outDir: String, indexDir: String): Unit = {
    require(bench.shingleN == N,
      s"benchmark shingle length ${bench.shingleN} != release's $N")
    // the index lock covers the release too (append writes both; one
    // writer per release+index pair): a concurrent appender fails
    // loudly instead of interleaving staging deletes
    StagedCommit.withWriterLock(fsFor(spark, indexDir),
        new Path(indexDir)) {
    heal(spark, indexDir)
    if (delta.isEmpty) return // nothing to apply (and min/max would be null)
    val maxBase = spark.read.parquet(s"$indexDir/meta")
      .agg(max(col("max_doc_id"))).head.getLong(0)
    val mm = delta.agg(min(col("doc_id")), max(col("doc_id"))).head
    val (minDelta, maxDelta) = (mm.getLong(0), mm.getLong(1))
    if (maxDelta <= maxBase) return // replayed, fully-applied batch: no-op
    require(minDelta > maxBase,
      s"delta ids must exceed the released max ($minDelta <= $maxBase): " +
        "append-only equality needs monotone ingest order")

    val dsets = SimilarityOps.shingleSets(delta, col("doc_id"), col("text"), N)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dbands = SimilarityOps.lshBands(
        SimilarityOps.minhashSignature(dsets, K), K, B)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Only band buckets the DELTA touches can produce candidates or new
    // flood verdicts, so the base index is read pruned two ways: the
    // delta's sig prefixes eliminate whole index partitions at planning
    // time, and the broadcast semi-join keeps only delta-touched buckets
    // — O(delta) read, matching the header's claim.
    val dkeys = dbands.select(col("band"), col("sig")).distinct()
    val idxBands = deltaTouchedBands(spark, indexDir, dkeys)

    // ---- near-dup: candidates = band-bucket collisions with the DELTA
    // on the loser (greater-id) side, capped on the UNION bucket size —
    // exactly the pairs a full rebuild would consider with b ∈ delta.
    // Base-side and union bucket counts come out of ONE aggregation
    // (base rows tagged 1, delta rows 0) so the flood guard below costs
    // no extra scan/aggregation job — its count() materializes the
    // cached frame okBuckets then reuses.
    val bucketCounts = idxBands.select(col("band"), col("sig"),
        lit(1L).as("__isBase"))
      .unionByName(dbands.select(col("band"), col("sig"),
        lit(0L).as("__isBase")))
      .groupBy("band", "sig")
      .agg(count(lit(1)).as("__bc"), sum(col("__isBase")).as("__base"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // guard 2: a delta that pushes a bucket holding >= 2 base docs over
    // the cap would retroactively drop base-base pairs in a rebuild —
    // the one shape an append cannot reproduce. Untouched buckets keep
    // their counts, so checking the delta-touched slice is exhaustive.
    val flooded = bucketCounts
      .filter(col("__base") >= 2 && col("__base") <= Cap &&
        col("__bc") > Cap)
      .count()
    require(flooded == 0,
      s"$flooded band buckets shared by base documents would cross the " +
        "flood cap — base verdicts would change; rebuild instead")
    val okBuckets = bucketCounts.filter(col("__bc") <= Cap).select("band", "sig")
    val partners = idxBands.unionByName(dbands)
      .join(okBuckets, Seq("band", "sig"))
      .select(col("band"), col("sig"), col("__id").as("a"))
    val dside = dbands.join(okBuckets, Seq("band", "sig"))
      .select(col("band"), col("sig"), col("__id").as("b"))
    val cand = partners.join(dside, Seq("band", "sig"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // verify against the shingle index — read pruned to the doc-id
    // buckets holding base-side candidates (b is always a delta doc, so
    // the delta's own frame covers everything else); a delta with no
    // base collisions reads NO base shingles at all
    val basePrefixes = cand.filter(col("a") <= maxBase)
      .select(pmod(col("a"), lit(DocPartitions.toLong)).as("p")).distinct()
      .collect().map(_.getLong(0)) // bounded: ≤ DocPartitions values
    val baseSets = spark.read.parquet(s"$indexDir/shingles")
      .filter(col("__dp").isin(basePrefixes.toSeq: _*))
      .select(col("doc_id").as("__id"), col("sh").as("__sh"))
    val dlosers = SimilarityOps.jaccardVerify(cand, baseSets.union(dsets), Thresh)
      .select(col("b").as("doc_b")).distinct()

    // ---- exact dedup across the boundary: a delta doc whose fp is
    // already indexed can never be canonical (base ids are smaller).
    // Dups are dropped BEFORE packing — in the pack they would shift the
    // cumsum and every later delta row's seq_id. Bands/shingles/fps above
    // still cover the FULL delta (a rebuild's pair search sees dup docs
    // too, and they can make other docs losers). The fps read prunes to
    // the partitions the delta's own fingerprints can land in.
    val dfps = delta
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fpPrefixes = dfps
      .select(substring(col("fp"), 1, SigPrefixLen).as("p")).distinct()
      .collect().map(_.getString(0)) // bounded: ≤ 256 values
    val idxFps = spark.read.parquet(s"$indexDir/fps")
      .filter(col("__fp").isin(fpPrefixes.toSeq: _*))
      .select("fp").distinct()
    val dupOfBase = dfps.join(idxFps, "fp").select("doc_id")
    val freshDelta = delta.join(dupOfBase, Seq("doc_id"), "left_anti")

    val baseTotals = spark.read.parquet(s"$indexDir/totals")
      .groupBy("split", "bucket")
      .agg(sum(col("wc_sum")).as("total_wc"))
    val packed = packKept(freshDelta, dsets, dlosers, bench,
      baseTotals = Some(baseTotals))

    // ---- staged commit: write everything under _staging, then move the
    // files into place manifest-ordered with meta LAST ([[StagedCommit]]).
    val fs = fsFor(spark, indexDir)
    val staging = stagingPath(indexDir)
    fs.delete(staging, true)
    CorpusReleaseApp.writeRelease(packed, s"$staging/release", mode = "overwrite")
    writeIndex(delta, dsets, dbands, packed, s"$staging/idx", mode = "overwrite")
    dsets.unpersist(); dbands.unpersist(); bucketCounts.unpersist()
    cand.unpersist(); dfps.unpersist()
    // the partition dirs this append touched, read off the STAGED
    // layout before publish moves it: only these can have grown, so
    // compaction's trigger check below is O(touched), not a listing of
    // every sidecar dir (~580 listStatus round-trips per micro-batch
    // on an object store otherwise)
    val touched = Seq("bands", "fps", "shingles").map(s =>
      s -> Compaction.partitionDirs(fs, new Path(s"$staging/idx/$s"))
        .map(_.getName)).toMap
    StagedCommit.publish(fs, staging,
      Seq("release" -> outDir, "idx" -> indexDir), lastFragment = "/meta/")
    // bounded compaction AFTER the batch is fully applied: any sidecar
    // partition dir this append grew past the threshold merges to one
    // file (in its lookup-key order, so row-group skipping survives) —
    // without it the streaming form grows one file per dir per
    // micro-batch forever. Crash here ⇒ healed before the next read.
    compactIndex(spark, fs, indexDir, Some(touched))
    }
  }

  /** Merge every sidecar index dir holding more than
    * [[Compaction.DefaultMaxFiles]] small files down to one. `touched`
    * scopes the trigger check to the dirs one append grew (every
    * growth is a touch, so an untouched dir is already at its
    * last-touch bound); `None` checks everything — the manual/repair
    * form. The release data itself is NOT compacted: released files
    * are append-only by contract (the spec pins byte-identical
    * survival), and their count is bounded by the packing layout, not
    * the append count. */
  private[apps] def compactIndex(spark: SparkSession, fs: FileSystem,
                                 indexDir: String,
                                 touched: Option[Map[String, Seq[String]]] = None)
      : Unit = {
    import Compaction.{Group, partitionDirs}
    def dirsOf(sub: String): Seq[Path] = touched match {
      case Some(m) => m.getOrElse(sub, Nil)
        .map(n => new Path(s"$indexDir/$sub/$n"))
      case None => partitionDirs(fs, new Path(s"$indexDir/$sub"))
    }
    Compaction.compact(spark, fs, stagingPath(indexDir), Seq(
      Group(dirsOf("bands"), Seq(col("sig"))),
      Group(dirsOf("fps"), Seq(col("fp"))),
      Group(dirsOf("shingles"), Seq(col("doc_id"))),
      Group(Seq(new Path(s"$indexDir/totals")),
        Seq(col("split"), col("bucket"))),
      Group(Seq(new Path(s"$indexDir/meta")), Seq(col("max_doc_id")))))
  }

  /** Complete (or discard) a torn append left by a crash (meta lands
    * last — after healing, the batch reads as applied and its replay
    * no-ops). */
  private def heal(spark: SparkSession, indexDir: String): Unit =
    StagedCommit.heal(fsFor(spark, indexDir), stagingPath(indexDir))

  /** The bands-index slice an append actually needs: partition-pruned to
    * the delta's sig prefixes (planning-time, ≤ 16^SigPrefixLen literal
    * values), then semi-joined to the delta's exact (band, sig) buckets.
    * Exposed private[apps] so the spec can assert the pruning. */
  private[apps] def deltaTouchedBands(spark: SparkSession, indexDir: String,
                                      dkeys: DataFrame): DataFrame = {
    val prefixes = dkeys
      .select(substring(col("sig"), 1, SigPrefixLen).as("p")).distinct()
      .collect().map(_.getString(0)) // bounded: ≤ 256 values
    spark.read.parquet(s"$indexDir/bands")
      .filter(col("__sp").isin(prefixes.toSeq: _*))
      .join(broadcast(dkeys), Seq("band", "sig"))
      .select(col("__id"), col("band"), col("sig")) // lshBands' column order
  }

  private def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stagingPath(indexDir: String): Path =
    new Path(s"$indexDir/_staging")

  // -------------------------------------------------------------- takedown

  /** Retract documents from the release (takedown / opt-out — the
    * right-to-be-forgotten operation a living corpus must support
    * without a rebuild): rewrites ONLY the parquet files that contain
    * the target rows (split-directory pruning + per-file containment),
    * in ONE Spark job regardless of how many files are hit, leaving
    * every other file byte-untouched — O(files-hit), not O(release).
    *
    * Semantics the spec pins down:
    *  - retracted rows vanish; all other rows are exactly preserved —
    *    packed sequence ids keep their values, so retraction leaves
    *    HOLES in sequences rather than repacking (consumers already
    *    tolerate short sequences; repacking would rewrite the world);
    *  - the packing TOTALS keep counting retracted tokens — later
    *    appends land exactly where they would have anyway;
    *  - the fingerprint index keeps the retracted fp: a byte-identical
    *    future copy of a taken-down document must NOT re-enter the
    *    release (takedown is a verdict, not an eviction);
    *  - the bands/shingles indexes ALSO keep the retracted documents,
    *    deliberately: the verdict extends to NEAR-duplicates — a later
    *    delta document that is substantially the taken-down content
    *    loses the near-dup comparison against it and stays out, exactly
    *    as a trivially-perturbed copy should. (Appends after a
    *    retraction therefore equal a rebuild over the PRE-retraction
    *    corpus minus the holes, not a rebuild that never saw the
    *    retracted docs — that is the intended takedown semantic.)
    *
    * Each file swap goes through a dot-prefixed aside copy (invisible
    * to parquet readers), so every intermediate state still holds one
    * complete copy of the kept rows — a crash can orphan an aside file
    * or leave a file's rows temporarily dark, but never lose them. */
  def retract(spark: SparkSession, docIds: Seq[Long], outDir: String,
              indexDir: String): Unit = {
    import org.apache.spark.sql.functions.{col => c}
    if (docIds.isEmpty) return
    StagedCommit.withWriterLock(fsFor(spark, indexDir),
        new Path(indexDir)) {
    // finish any torn append FIRST: a target row sitting in a staged-
    // but-unmoved file would otherwise dodge discovery and re-enter the
    // release when a later append heals the manifest — and repair any
    // torn swap from a crashed PREVIOUS retraction, whose dark rows
    // would likewise dodge the discovery scan below. The heal walk is
    // gated on the crashed rewrite's marker (its tmp dir is removed
    // only after every swap completes), keeping the common no-crash
    // takedown O(files-hit) — never an O(release) recursive listing.
    heal(spark, indexDir)
    val relFs = fsFor(spark, outDir)
    if (relFs.exists(new Path(s"$outDir/_retract")))
      SurgicalRewrite.heal(relFs, new Path(outDir))
    // a document's split is a pure function of its id, so the discovery
    // scan partition-prunes to the target docs' split directories before
    // the pushed doc_id filter does the row-group work
    val splits = docIds.map { id =>
      val h = graft.functions.StableHash.stable60Local(id.toString) % 100
      if (h < 80) "train" else if (h < 90) "validation" else "test"
    }.distinct
    // small takedowns stay a pushed In-filter; large ones run as a
    // broadcast semi-join (discovery) / anti-join (rewrite) so the
    // expression tree never grows with the takedown size
    val hit = SurgicalRewrite.hitFiles(
      spark.read.parquet(outDir).filter(c("split").isin(splits: _*)),
      docIds, "doc_id") // bounded: ≤ |docIds| × epochs
    // rows stay in the layout contract's (bucket, seq_id) order (split
    // is constant within a file), doc_id/epoch as a deterministic
    // tiebreak
    SurgicalRewrite.rewrite(spark, hit, s"$outDir/_retract",
      SurgicalRewrite.excluding(_, docIds, "doc_id"),
      Seq(col("bucket"), col("seq_id"), col("doc_id"), col("epoch")))
    }
  }

  // ------------------------------------------------------------- streaming

  /** The STREAMING release: documents arrive as a stream (monotone ids —
    * ingest order), and every micro-batch [[append]]s incrementally, so
    * the release and its indexes are valid, queryable state after each
    * batch — the corpus-release pipeline is no longer a nightly job.
    * Bootstrap with [[releaseAll]] over the day-0 backfill first.
    *
    * Crash contract: [[append]] is idempotent under micro-batch replay —
    * a torn append is healed from its commit manifest (or discarded if
    * it never reached the commit point) and an already-applied batch
    * no-ops against the meta marker, so kill-and-restart converges to
    * the clean run's output with no operator surgery (spec-asserted). */
  def stream(docs: DataFrame, bench: StreamingDecontamApp.Benchmark,
             outDir: String, indexDir: String,
             checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      // no empty-batch pre-check: append() no-ops on an empty delta
      // itself, and calling it unconditionally lets an empty batch
      // heal a torn previous append immediately
      .foreachBatch { (batch: DataFrame, _: Long) =>
        append(batch.sparkSession, batch, bench, outDir, indexDir)
      }
      .start()

  // --------------------------------------------------------------- shared

  /** clean (quality + canon + injected losers) → decontaminate (static
    * bench) → sample/mix/split/pack — identical stages for the full
    * build and the delta (the fp window spans the given docs; the
    * cross-boundary fp gate is the caller's anti-join). */
  private def packKept(docs: DataFrame, sets: DataFrame, losers: DataFrame,
                       bench: StreamingDecontamApp.Benchmark,
                       baseTotals: Option[DataFrame]): DataFrame = {
    val clean = TextQueries.cleanCorpusDocs(docs, losers)
    val sh = sets.select(col("__id").as("doc_id"),
      explode(array_distinct(col("__sh"))).as("s"))
    val contaminated = TextQueries
      .overlapAgainstBench(sh, bench.rows, bench.minOverlap)
      .select("doc_id").distinct()
    val kept = clean
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(docs.select(col("doc_id"), col("source"),
        TextFunctions.wordCount(col("text")).as("wc")), "doc_id")
    CorpusReleaseApp.sampleMixSplitPack(kept, baseTotals)
  }

  /** All index updates are parquet APPENDS (overwrite only on the full
    * build; the incremental path writes these under _staging and moves
    * the files in): fps may repeat across batches (consumers `distinct`),
    * totals accumulate per-batch sums (consumers re-aggregate) — the
    * same append-only discipline as the release rows themselves. The
    * bands index is partitioned by the sig prefix [[deltaTouchedBands]]
    * prunes on. */
  private def writeIndex(docs: DataFrame, sets: DataFrame, bands: DataFrame,
                         packed: DataFrame, indexDir: String,
                         mode: String): Unit = {
    // each partitioned index writes through ONE exchange on its
    // partition key — without it every task writes a sliver of every
    // directory and the index fragments into O(tasks × partitions)
    // small files (the keys are md5-prefix/mod values: uniform, no
    // skew); rows cluster by the lookup key inside each directory
    def partitioned(df: DataFrame, pcol: String, cluster: Column,
                    dest: String): Unit =
      df.repartition(col(pcol))
        .sortWithinPartitions(col(pcol), cluster)
        .write.mode(mode).partitionBy(pcol).parquet(dest)
    partitioned(
      docs.select(TextFunctions.fingerprint(col("text")).as("fp")).distinct()
        .withColumn("__fp", substring(col("fp"), 1, SigPrefixLen)),
      "__fp", col("fp"), s"$indexDir/fps")
    partitioned(
      bands.withColumn("__sp", substring(col("sig"), 1, SigPrefixLen)),
      "__sp", col("sig"), s"$indexDir/bands")
    partitioned(
      sets.select(col("__id").as("doc_id"), col("__sh").as("sh"))
        .withColumn("__dp", pmod(col("doc_id"), lit(DocPartitions.toLong))),
      "__dp", col("doc_id"), s"$indexDir/shingles")
    packed.groupBy("split", "bucket").agg(sum(col("wc")).as("wc_sum"))
      .write.mode(mode).parquet(s"$indexDir/totals")
    docs.agg(max(col("doc_id")).as("max_doc_id"))
      .write.mode(mode).parquet(s"$indexDir/meta")
  }
}
