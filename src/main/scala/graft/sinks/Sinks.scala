package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.apps.{Compaction, Snapshots, StagedCommit}
import graft.functions.StableHash
import graft.operators.DedupOps

/** Sink layer — local-filesystem analogues of the reference's connector
  * sinks (Kafka topics / HBase / Doris become parquet directories; the
  * topology — fixed target, per-record dynamic target, keyed upsert — is
  * the part that carries over).
  *
  *  - K1 fixed-topic append           (`util/KafkaUtil.java:55-60`)
  *  - K2 dynamic per-record topic     (`app/dwd/DwdBaseApp.java:100-106` —
  *    topic taken from a column of the record)
  *  - K3 keyed upsert, last-wins      (upsert-kafka DDLs, e.g.
  *    `app/dwd/DwdTradeOrderDetail.java:174-219`)
  *  - K4 dim upsert                   (`app/dim/func/DimSinkFunction.java:40-62`
  *    — same merge, keyed by table+rowkey)
  *  - K7 debug/print sink             (`print()` calls throughout the apps)
  *
  * Exactly-once (R1/R2): streaming variants take a mandatory checkpoint
  * directory. `streamAppend` rides the file-sink commit log; `streamUpsert`
  * folds the batch id into the merge order so replays are idempotent;
  * `streamDynamic` writes each micro-batch under its own `__batch=<id>`
  * partition with dynamic partition overwrite, so a replayed batch
  * REPLACES its own output instead of appending duplicates. The restart
  * paths are asserted in `SinksSpec`.
  */
object Sinks {

  /** K1 — append to a fixed target. */
  def appendFixed(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** K2 — per-record dynamic routing: the target directory comes from a
    * COLUMN (`partitionBy`), one pass, no per-target scan. Hive-style
    * `topic=<v>/` subdirs are the topic fan-out. */
  def dynamicByColumn(df: DataFrame, topicCol: String, path: String): Unit =
    df.write.mode("append").partitionBy(topicCol).parquet(path)

  /** K2 batch body of [[streamDynamic]], exposed for direct testing:
    * the batch lands under `topic=<v>/__batch=<id>/` with DYNAMIC
    * partition overwrite, so re-applying the same batch id replaces its
    * own partitions (idempotent under streaming replay) and never touches
    * other batches' output. */
  def dynamicIdempotent(batch: DataFrame, topicCol: String, path: String,
                        batchId: Long): Unit =
    batch.withColumn("__batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(topicCol, "__batch")
      .parquet(path)

  /** Number of hash buckets a keyed table is partitioned into. Sized so
    * one bucket ≈ table/64 — at 100 TB, raise via the `nBuckets` knob
    * (the layout is self-describing, but a table must keep one value for
    * its lifetime: the bucket of a key is `stable60(key) % nBuckets`). */
  val DefaultUpsertBuckets = 64

  /** Engine-portable bucket id of the concatenated key columns — the same
    * `stable60 % n` the salting UDF (U1) uses, so the oracle/driver can
    * reproduce the layout. */
  def bucketOf(keys: Seq[String], nBuckets: Int) =
    StableHash.bucket60(
      concat_ws("", keys.map(k => col(k).cast("string")): _*), nBuckets)
      .cast("int")

  /** K3/K4 — keyed upsert, deterministic last-wins under `order`, with an
    * INCREMENTAL bucket-partitioned merge.
    *
    * Layout: the table lives as `path/__bucket=<b>/` Hive partitions,
    * `b = stable60(key) % nBuckets`. A merge
    *   1. computes the incoming rows' buckets (every key lives in exactly
    *      one bucket, so keep-last within touched buckets is globally
    *      correct),
    *   2. reads ONLY the touched buckets (partition-pruned scan),
    *   3. merges + keep-lasts them (union → row_number, one shuffle over
    *      touched-bucket data, not the table),
    *   4. stages the result partitioned by bucket, then swaps each touched
    *      bucket directory into place by rename.
    * Untouched buckets are never read or written — cost scales with
    * O(batch ∪ touched buckets), not O(table), which is what lets a
    * continuously-running stream upsert survive a 100 TB table. (A
    * transactional table format's MERGE INTO is the managed version of
    * exactly this.)
    *
    * Crash safety: the staging write completes before any live mutation;
    * each bucket swap is the move-aside / promote / drop-old sequence of
    * [[overwriteSwapped]] with the `.old` copy held OUTSIDE the table root
    * (a `__bucket=5.old` dir inside it would poison partition discovery).
    * A crash between bucket swaps leaves some buckets new and some old —
    * re-applying the batch (streaming replay does this) converges, because
    * the merge is idempotent under `order` (callers fold the batch id into
    * `order`). Leftover `.old` dirs from a crash are healed at the start
    * of the next merge. */
  def upsertKeyed(spark: SparkSession, incoming: DataFrame, keys: Seq[String],
                  order: Seq[String], path: String,
                  dropCols: Seq[String] = Nil,
                  nBuckets: Int = DefaultUpsertBuckets,
                  snapshotted: Boolean = false): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    locked(fs, path, snapMode(fs, path, snapshotted)) { snap =>
      upsertKeyedBody(spark, fs, incoming, keys, order, path, dropCols,
        nBuckets, snap)
    }
  }

  private def upsertKeyedBody(spark: SparkSession, fs: FileSystem,
                              incoming: DataFrame, keys: Seq[String],
                              order: Seq[String], path: String,
                              dropCols: Seq[String], nBuckets: Int,
                              snap: Boolean): Unit = {
    // the layout is self-describing: the bucket count is recorded at
    // table creation and every later merge USES THE RECORDED VALUE — a
    // caller passing a different nBuckets would otherwise hash keys into
    // the wrong buckets and silently duplicate them across the table
    val effectiveBuckets = readOrWriteBucketCount(fs, path, nBuckets)
    val withB = incoming.withColumn("__bucket", bucketOf(keys, effectiveBuckets))
    val touched = withB.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted // ≤ nBuckets values, driver-safe
    if (touched.isEmpty) return
    val current = liveTouched(spark, fs, path, touched.toIndexedSeq, snap)
    val merged = current match {
      case Some(cur) => cur.unionByName(withB, allowMissingColumns = true)
      case None => withB
    }
    val deduped = DedupOps.keepLast(merged, keys.map(col), order.map(col))
      .drop(dropCols: _*)
    if (snap) stageAndInstall(spark, fs, path, deduped, touched.toIndexedSeq)
    else stageAndSwap(fs, path, deduped, touched.toIndexedSeq)
  }

  /** A table is SNAPSHOT-MANAGED once it has a committed [[Snapshots]]
    * manifest — detected, not just requested: after the first manifest
    * commit every write MUST stay on the snapshot path (a raw bucket
    * swap would leave the previous commit's retired grace-window files
    * visible to raw readers, duplicating their rows). Requesting
    * `snapshotted` on an existing raw table upgrades it with one
    * bootstrap commit adopting the current files as version 1. */
  private def snapMode(fs: FileSystem, path: String,
                       requested: Boolean): Boolean =
    requested || Snapshots.currentFiles(fs, new Path(path)).isDefined

  /** Run a mutation in the detected mode. Snapshot mode takes the
    * table's single-writer lock first (the [[Snapshots]] contract —
    * "the snapshot layer never writes outside it": a second concurrent
    * writer must fail loudly, not interleave pending journals and
    * manifest versions), then heals any torn previous write —
    * staged-install first (its journaled files must be
    * all-present-or-none before the snapshot heal can adjudicate the
    * pending journal), then the journal, then the bootstrap commit if
    * the table predates its management. Legacy mode only heals `.old`
    * bucket leftovers, as before. */
  private def locked(fs: FileSystem, path: String, snap: Boolean)(
      body: Boolean => Unit): Unit = {
    healBuckets(fs, path) // legacy `.old` leftovers (pre-snapshot crashes)
    if (snap) StagedCommit.withWriterLock(fs, new Path(path)) {
      val root = new Path(path)
      StagedCommit.heal(fs, new Path(path + ".staging"))
      Snapshots.heal(fs, root)
      if (Snapshots.currentFiles(fs, root).isEmpty && fs.exists(root)) {
        Snapshots.commit(fs, root); ()
      }
      body(true)
    } else body(false)
  }

  /** The current rows of `path`'s touched buckets. Snapshot mode reads
    * through the manifest — never the raw directories, which may also
    * hold the previous commit's retired (grace-window) files. */
  private def liveTouched(spark: SparkSession, fs: FileSystem, path: String,
                          touched: Seq[Int], snap: Boolean)
      : Option[DataFrame] = {
    val root = new Path(path)
    val dirs =
      if (snap) {
        val names = touched.map(b => s"__bucket=$b").toSet
        Snapshots.currentFiles(fs, root).getOrElse(Nil)
          .filter(f => names.contains(f.takeWhile(_ != '/')))
          .map(p => new Path(root, p).toString)
      } else touched.map(b => new Path(path, s"__bucket=$b"))
        .filter(fs.exists).map(_.toString)
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", path).parquet(dirs: _*))
  }

  /** Snapshot-mode twin of [[stageAndSwap]]: stage `df` partitioned by
    * bucket, journal the intent, install the staged files ALONGSIDE the
    * live ones (all-or-nothing through a [[StagedCommit]] manifest —
    * staged part-file names carry a per-job UUID, so they never collide
    * with live files), then snapshot-commit: the staged files become
    * the touched buckets' data and the replaced originals RETIRE,
    * outliving the commit by two more commits (the readers' grace
    * window, same contract as [[graft.apps.Compaction]]'s snapshot
    * groups). A reader that planned before the commit keeps every file
    * it resolved; one that plans after sees exactly the post-batch
    * table — pre- or post-batch state, never a mix, never a deleted
    * file. Crash-safe via [[locked]]'s heal-first discipline: the
    * pending journal is either aborted (nothing installed) or
    * completed (everything installed) on the next writer entry. */
  private def stageAndInstall(spark: SparkSession, fs: FileSystem,
                              path: String, df: DataFrame,
                              buckets: Seq[Int],
                              newBucketCount: Option[Int] = None,
                              newTargetBytes: Option[Long] = None): Unit = {
    val root = new Path(path)
    val staging = new Path(path + ".staging")
    df.write.mode("overwrite").partitionBy("__bucket")
      .parquet(staging.toString)
    val names = buckets.map(b => s"__bucket=$b")
    val nameSet = names.toSet
    val replaced = Snapshots.currentFiles(fs, root).getOrElse(Nil)
      .filter(f => nameSet.contains(f.takeWhile(_ != '/')))
    val moves = names.flatMap { n =>
      Compaction.visibleFiles(fs, new Path(staging, n)).map { st =>
        (s"$n/${st.getPath.getName}",
          StagedCommit.Move(st.getPath, new Path(root, s"$n/${st.getPath.getName}")))
      }
    }
    if (replaced.isEmpty && moves.isEmpty) { fs.delete(staging, true); return }
    fs.mkdirs(root)
    // newBucketCount / newTargetBytes ride the pending journal and the
    // commit, so a rebucket's count+target+layout flip is atomic in
    // the crash-heal path too
    Snapshots.writePending(fs, root, replaced, moves.map(_._1),
      newBucketCount, newTargetBytes)
    StagedCommit.publishOps(fs, staging, moves.map(_._2))
    Snapshots.commitPending(fs, root)
  }

  /** [[upsertKeyed]]'s ADDITIVE sibling — the incremental bucket merge
    * with an associative COMBINE instead of keep-last, made
    * exactly-once under streaming replay by a per-bucket batch stamp.
    *
    * `delta` holds this batch's per-key partial aggregates; the merge
    * reads ONLY the touched buckets, re-aggregates (live ∪ delta) by
    * `keys` with the caller's `combine` aggregates (which must be
    * associative+commutative — sums, min/max, struct-argmin/argmax),
    * and swaps the touched bucket dirs. Untouched buckets are never
    * read or written — O(batch ∪ touched buckets), never O(table).
    *
    * EXACTLY-ONCE under replay: an additive merge is not naturally
    * idempotent (applying a delta twice double-counts), so every
    * merged row carries `__mart_batch` = the max batch id that touched
    * it, and a bucket whose live rows already show this batch id is
    * SKIPPED — the bucket-dir swap is atomic, so after a crash each
    * touched bucket is either fully merged (stamped, skipped on
    * replay) or untouched (re-merged), and the replay converges with
    * no double count. Callers must pass the streaming micro-batch id
    * (monotone per checkpoint; a replayed batch reuses its id with
    * identical content — the foreachBatch contract). */
  def upsertCombine(spark: SparkSession, delta: DataFrame, keys: Seq[String],
                    combine: Seq[Column], batchId: Long, path: String,
                    nBuckets: Int = DefaultUpsertBuckets,
                    snapshotted: Boolean = false): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    locked(fs, path, snapMode(fs, path, snapshotted)) { snap =>
      upsertCombineBody(spark, fs, delta, keys, combine, batchId, path,
        nBuckets, snap)
    }
  }

  private def upsertCombineBody(spark: SparkSession, fs: FileSystem,
                                delta: DataFrame, keys: Seq[String],
                                combine: Seq[Column], batchId: Long,
                                path: String, nBuckets: Int,
                                snap: Boolean): Unit = {
    val effectiveBuckets = readOrWriteBucketCount(fs, path, nBuckets)
    val withB = delta
      .withColumn("__bucket", bucketOf(keys, effectiveBuckets))
      .withColumn("__mart_batch", lit(batchId))
    val touched = withB.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted // ≤ nBuckets values, driver-safe
    if (touched.isEmpty) return
    val (skip, current) =
      liveTouched(spark, fs, path, touched.toIndexedSeq, snap) match {
        case Some(live) =>
          // buckets stamped with this batch id OR LATER are fully merged
          // (stamps apply in strictly increasing order per table, and the
          // stored stamp is the bucket's max — so a later stamp proves
          // this one landed; `===` would let a same-batch follow-up
          // mutation, e.g. a retention fold, mask the main stamp and
          // make a crash replay double-apply it) — replay skips them
          (live.filter(col("__mart_batch") >= batchId)
            .select("__bucket").distinct().collect().map(_.getInt(0)),
            Some(live))
        case None => (Array.empty[Int], None)
      }
    val todo = touched.filterNot(skip.contains)
    if (todo.isEmpty) return
    val incoming = withB.filter(col("__bucket").isin(todo.map(Int.box): _*))
    val merged = current match {
      case Some(cur) => cur
        .filter(col("__bucket").isin(todo.map(Int.box): _*))
        .unionByName(incoming, allowMissingColumns = true)
      case None => incoming
    }
    val combined = merged
      .groupBy((keys :+ "__bucket").map(col): _*)
      .agg(combine.head, combine.tail :+
        max(col("__mart_batch")).as("__mart_batch"): _*)
    if (snap) stageAndInstall(spark, fs, path, combined, todo.toIndexedSeq)
    else stageAndSwap(fs, path, combined, todo.toIndexedSeq)
  }

  /** Read a table written by [[upsertCombine]] without its layout and
    * replay-stamp columns. Snapshot-managed tables are read through
    * their newest manifest (file list pinned at PLAN time — a writer
    * committing mid-query cannot tear the read or delete a referenced
    * file inside the grace window); raw tables read as before. */
  def readCombined(spark: SparkSession, path: String): DataFrame =
    Snapshots.readTable(spark, new Path(path))
      .drop("__bucket", "__mart_batch")

  /** [[readCombined]] pinned at a specific snapshot version — the
    * member read of a cross-table group resolution
    * ([[graft.apps.Snapshots.commitGroup]]). */
  def readCombinedAt(spark: SparkSession, path: String,
                     version: Int): DataFrame =
    Snapshots.readTableAt(spark, new Path(path), version)
      .drop("__bucket", "__mart_batch")

  /** [[readKeyed]] pinned at a specific snapshot version. */
  def readKeyedAt(spark: SparkSession, path: String,
                  version: Int): DataFrame =
    Snapshots.readTableAt(spark, new Path(path), version).drop("__bucket")

  /** Stage `df` (which must carry `__bucket`) partitioned by bucket, then
    * swap exactly the `buckets` dirs into the live table. A targeted
    * bucket with NO staged output (every row removed) has its live dir
    * dropped. */
  private def stageAndSwap(fs: FileSystem, path: String,
                           df: DataFrame, buckets: Seq[Int]): Unit = {
    val staging = new Path(path + ".staging")
    df.write.mode("overwrite").partitionBy("__bucket")
      .parquet(staging.toString)
    fs.mkdirs(new Path(path))
    buckets.foreach { b =>
      val staged = new Path(staging, s"__bucket=$b")
      val live = new Path(path, s"__bucket=$b")
      if (fs.exists(staged))
        swapDir(fs, staged, live, new Path(path + ".old", s"__bucket=$b"))
      else if (fs.exists(live)) fs.delete(live, true)
    }
    fs.delete(staging, true)
  }

  /** K4 compaction — drop tombstones older than `olderThan` (the
    * pipeline's out-of-orderness bound: a tombstone only needs to outlive
    * the latest event that could still try to resurrect its key). The
    * tombstone-flavored [[deleteWhere]]. */
  def purgeTombstones(spark: SparkSession, path: String, tsCol: String,
                      olderThan: Long,
                      tombstoneCol: String = "__tombstone"): Unit =
    deleteWhere(spark, path, col(tombstoneCol) && col(tsCol) <= olderThan)

  /** Delete every row of an [[upsertKeyed]]/[[upsertCombine]] table
    * matching `predicate` — the state-retention primitive (W7's TTL
    * expiry, the decay tier's retired-bucket sweep). Only buckets
    * CONTAINING matching rows are rewritten; the rest of the table is
    * untouched — same incremental cost model as the merge itself (the
    * DISCOVERY pass scans the table once; callers run it as periodic
    * maintenance, not per batch). A null predicate row is treated as
    * NOT matching and kept. Idempotent: re-running after a crash finds
    * the already-deleted rows gone and rewrites nothing. */
  def deleteWhere(spark: SparkSession, path: String,
                  predicate: Column,
                  snapshotted: Boolean = false): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return
    locked(fs, path, snapMode(fs, path, snapshotted)) { snap =>
      val table = if (snap) Snapshots.readTable(spark, new Path(path))
                  else spark.read.parquet(path)
      val hit = coalesce(predicate, lit(false))
      val affected = table.filter(hit)
        .select("__bucket").distinct().collect().map(_.getInt(0)).sorted
      if (affected.nonEmpty)
        liveTouched(spark, fs, path, affected.toIndexedSeq, snap)
          .foreach { live =>
            val kept = live.filter(!hit)
            if (snap) stageAndInstall(spark, fs, path, kept,
              affected.toIndexedSeq)
            else stageAndSwap(fs, path, kept, affected.toIndexedSeq)
          }
    }
  }

  /** The atomic move-rows cousin of [[deleteWhere]] — the retention
    * primitive for folding expired rows into carry rows OF THE SAME
    * TABLE in ONE commit: rows matching `predicate` are removed and
    * `migrate(matching)` rows (same schema, keys included — they may
    * hash into OTHER buckets) are merged in, re-aggregating every
    * touched bucket by `keys` with the caller's associative `combine`.
    * Because source removal and carry merge land in one
    * [[stageAndInstall]] (one staged manifest, one snapshot commit), a
    * concurrent reader sees the table before OR after the whole
    * migration — never the torn middle where rows exist twice or not
    * at all — and a crash heals to exactly one of those two states,
    * which also makes the operation replay-idempotent with no batch
    * stamp: once applied, `predicate` matches nothing. */
  def migrateWhere(spark: SparkSession, path: String, predicate: Column,
                   migrate: DataFrame => DataFrame,
                   keys: Seq[String], combine: Seq[Column],
                   snapshotted: Boolean = false): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return
    locked(fs, path, snapMode(fs, path, snapshotted)) { snap =>
      val n = readOrWriteBucketCount(fs, path, DefaultUpsertBuckets)
      val table = if (snap) Snapshots.readTable(spark, new Path(path))
                  else spark.read.parquet(path)
      val hit = coalesce(predicate, lit(false))
      val srcBuckets = table.filter(hit)
        .select("__bucket").distinct().collect().map(_.getInt(0))
      if (srcBuckets.nonEmpty) {
        // materialized ONCE: `moved` is consulted for its destination
        // buckets and merged into the staged write — recomputing it
        // would re-run the discovery scan and the caller's aggregation
        // per consumer (it is carry-row-sized: bounded by the source
        // table's key space, ContextCleaner-collected after)
        val moved = migrate(table.filter(hit).drop("__bucket"))
          .withColumn("__bucket", bucketOf(keys, n))
          .localCheckpoint(true)
        val dstBuckets = moved
          .select("__bucket").distinct().collect().map(_.getInt(0))
        val touched = (srcBuckets ++ dstBuckets).distinct.sorted.toIndexedSeq
        val kept = liveTouched(spark, fs, path, touched, snap)
          .map(_.filter(!hit)).getOrElse(moved.limit(0))
        val merged = kept.unionByName(moved, allowMissingColumns = true)
          .groupBy((keys :+ "__bucket").map(col): _*)
          .agg(combine.head, combine.tail: _*)
        if (snap) stageAndInstall(spark, fs, path, merged, touched)
        else stageAndSwap(fs, path, merged, touched)
      }
    }
  }

  /** ONLINE RE-BUCKETING (r10 verdict task #2): rewrite a keyed/combine
    * table under a NEW bucket count in one atomic snapshot commit —
    * the operation that lets a table that grew 100× widen its layout
    * (or a shrunken one narrow it) without a manual offline rebuild,
    * closing the "nBuckets is frozen for a table's lifetime"
    * scale edge. The full rewrite is the irreducible cost (every key
    * changes bucket residence); what the machinery buys is that it is
    * SAFE to do live:
    *
    *  - rows are read through the pinned manifest, re-assigned
    *    `__bucket = stable60(key) % newN`, staged, and installed via
    *    the same pending-journal → all-or-nothing install → snapshot
    *    commit path every snapshot mutation uses;
    *  - the new bucket COUNT rides the commit itself (the manifest's
    *    `nbuckets` line), so count and layout flip in ONE rename —
    *    every later merge, prune, and `readKeyedFor` resolves the
    *    count from the manifest and can never hash against the wrong
    *    layout;
    *  - a concurrent reader planned before the commit executes against
    *    the complete OLD layout (grace window), one planned after sees
    *    the complete NEW layout — never a mix;
    *  - a crash at any stage heals at the next writer entry to exactly
    *    old-everything or new-everything (the pending journal carries
    *    the count, so even the heal's commit flips both together).
    *
    * REQUIRES a snapshot-managed table, refusing raw layouts loudly: a
    * raw table's crash contract is per-bucket replay (a crashed batch
    * leaves some buckets merged-and-stamped and others not, and the
    * replay converges because each bucket is an independent replay
    * unit) — re-hashing would mix stamped and unstamped keys into one
    * NEW bucket, whose stamp would then mask the unmerged keys' delta
    * on replay, losing it silently. Replay any in-flight batch on the
    * raw layout, upgrade with one `snapshotted = true` write (whose
    * mutations are table-atomic, so the mixed state cannot recur),
    * then rebucket. Keys are needed to re-hash: pass the table's key
    * columns. */
  def rebucket(spark: SparkSession, path: String, keys: Seq[String],
               newN: Int, targetBytes: Option[Long] = None): Unit = {
    require(newN > 0, s"bucket count must be positive (got $newN)")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return
    require(Snapshots.currentFiles(fs, new Path(path)).isDefined,
      s"rebucket requires a snapshot-managed table; $path is a raw " +
        "bucket layout whose crashed batches replay PER BUCKET — " +
        "re-hashing could merge a replayed bucket's stamp over an " +
        "unreplayed key's delta. Replay any in-flight batch, write " +
        "once with snapshotted = true to upgrade, then rebucket.")
    locked(fs, path, snap = true) { _ =>
      val oldN = readOrWriteBucketCount(fs, path, DefaultUpsertBuckets)
      if (oldN != newN) {
        val curFiles = Snapshots.currentFiles(fs, new Path(path))
          .getOrElse(Nil)
        if (curFiles.isEmpty) {
          // nothing to move — the count flip is a bare commit
          Snapshots.commit(fs, new Path(path), nbuckets = Some(newN),
            targetBytes = targetBytes); ()
        } else {
          val table = Snapshots.readTable(spark, new Path(path))
          val oldBuckets = curFiles.map(_.takeWhile(_ != '/'))
            .filter(_.startsWith("__bucket="))
            .map(_.stripPrefix("__bucket=").toInt).distinct
          // one exchange on the NEW bucket key: without it every input
          // task writes a sliver of every new bucket dir — O(tasks ×
          // newN) small files on a wide rebucket
          val restaged = table.drop("__bucket")
            .withColumn("__bucket", bucketOf(keys, newN))
            .repartition(col("__bucket"))
          // replace EVERY current file; target every possible new
          // bucket dir (names with no staged output install nothing) —
          // enumerating 0 until newN is driver-side metadata, where
          // collecting the ACTUAL new ids would re-run the full table
          // rehash once just to learn them
          stageAndInstall(spark, fs, path, restaged,
            (oldBuckets ++ (0 until newN)).distinct.sorted.toIndexedSeq,
            newBucketCount = Some(newN), newTargetBytes = targetBytes)
        }
        // best-effort sidecar sync for external layout consumers; the
        // manifest line is authoritative from this commit on, so a
        // crash landing between the commit above and this write is
        // harmless
        val marker = new Path(path + ".nbuckets")
        val out = fs.create(marker, true)
        try out.write(newN.toString.getBytes("UTF-8")) finally out.close()
      }
    }
  }

  /** Set a snapshot-managed table's PER-TABLE compaction graduation
    * size — one bare snapshot commit carrying the `targetbytes` line
    * ([[graft.apps.Snapshots.currentTargetBytes]]); every later
    * [[graft.apps.Compaction]] pass over this table graduates files at
    * THIS size instead of the global default. The manifest-ceiling
    * knob: a table that grew 100× keeps its manifest line count flat
    * by graduating at a proportionally larger size (manifest lines ≈
    * tableBytes / targetBytes), while small state tables stay at the
    * default. Pair with [[rebucket]]`(…, targetBytes = Some(_))` when
    * the layout should flip in the same commit. */
  def setCompactionTarget(spark: SparkSession, path: String,
                          bytes: Long): Unit = {
    require(bytes > 0, s"target bytes must be positive (got $bytes)")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an explicit setter must not silently no-op on a typo'd path or a
    // set-before-first-write ordering — the table would keep the
    // global default with no signal
    require(fs.exists(new Path(path)),
      s"setCompactionTarget: $path does not exist")
    require(Snapshots.currentFiles(fs, new Path(path)).isDefined,
      s"setCompactionTarget requires a snapshot-managed table; $path " +
        "has no manifest to carry the setting — write once with " +
        "snapshotted = true to upgrade first.")
    locked(fs, path, snap = true) { _ =>
      Snapshots.commit(fs, new Path(path), targetBytes = Some(bytes)); ()
    }
  }

  /** Default target size of ONE BUCKET of a keyed/combine table —
    * what [[recommendedBuckets]] aims for. The mart-probe measurement
    * behind the value (PLANS.md "Round 11/12"): per-DIRECTORY
    * filesystem constants dominate kilobyte-sized buckets (a 6400-way
    * layout cost ~3 s MORE per batch than 64-way at probe scale), so
    * buckets should be wide enough that scan time, not directory
    * count, is the cost — while staying within one executor's
    * comfortable working set for the merge's touched-bucket rewrite.
    * 256 MB sits between the parquet row-group sweet spot and the
    * shuffle-partition sizing the session uses. */
  val DefaultBucketTargetBytes: Long = 256L * 1024 * 1024

  /** Default target ROW COUNT of one bucket — the rewrite-amplification
    * bound the bytes target cannot see (r13 verdict "what's wrong #2").
    * The 1000× mart probe measured the per-batch ceiling directly
    * (PLANS.md round 13): at 2 M ultra-narrow state rows on 64 buckets
    * (~31 k rows/bucket, still only megabytes) every 100-user batch
    * rewrote the whole table — 42.4 s/batch — while 6400 buckets
    * (~312 rows/bucket) restored the 1× wall (15.0 s). Per-batch merge
    * cost is touchedBuckets × rowsPerBucket, so flatness requires
    * rows-per-bucket bounded ABSOLUTELY (and the bucket count to
    * exceed the batch's key count — a layout a few times wider than a
    * batch keeps the rewrite batch-sized, not state-sized). 512 sits
    * on the measured-flat side of the probe's decade; the opposing
    * per-directory constant (≈3 s per batch at 6400 kilobyte-sized
    * dirs, measured r11) only dominates for pipelines whose batches
    * are enormous relative to state — such operators raise this knob
    * alongside the bytes target. For wide-row tables the BYTES term
    * usually recommends more buckets first; the max of the two terms
    * applies the stricter bound. */
  val DefaultBucketTargetRows: Long = 512L

  /** ceil(total / perUnit), clamped to [1, Int.MaxValue] — THE
    * units-for-a-target arithmetic every widening policy shares
    * ([[recommendedBuckets]], [[graft.apps.TextIndexApp.autoWiden]],
    * [[graft.apps.VectorIndexApp.autoRetrain]]); one definition so the
    * rounding/clamp semantics cannot drift between tiers. */
  private[graft] def unitsFor(total: Long, perUnit: Long): Int = {
    // overflow-safe ceil-div: `total + perUnit - 1` wraps negative for
    // totals near Long.MaxValue, which would clamp the recommendation
    // to 1 — disabling every widening policy exactly when the table is
    // largest (r14 ADVICE)
    val ceil = total / perUnit + (if (total % perUnit == 0) 0L else 1L)
    math.max(1L, ceil).min(Int.MaxValue.toLong).toInt
  }

  /** Recommend a bucket count for a snapshot-managed keyed table from
    * its OWN pinned manifest: the max of a bytes term (total data
    * bytes / `targetBytesPerBucket` — scan cost) and a rows term
    * (total rows / `targetRowsPerBucket` — per-batch rewrite
    * amplification; see [[DefaultBucketTargetRows]] for the measured
    * rationale), min 1. Bytes come from driver-side status calls over
    * the manifest's file list; rows from one metadata-only count over
    * the pinned snapshot (parquet footers — no data scan). The
    * principled input to [[rebucket]]: widen when the table grew past
    * its layout (recommended ≫ current), narrow a shrunken one —
    * instead of guessing a power of two. */
  def recommendedBuckets(spark: SparkSession, path: String,
                         targetBytesPerBucket: Long = DefaultBucketTargetBytes,
                         targetRowsPerBucket: Long = DefaultBucketTargetRows)
      : Int = {
    require(targetBytesPerBucket > 0,
      s"target bytes per bucket must be positive (got $targetBytesPerBucket)")
    require(targetRowsPerBucket > 0,
      s"target rows per bucket must be positive (got $targetRowsPerBucket)")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Snapshots.currentFiles(fs, root).getOrElse {
      throw new IllegalArgumentException(
        s"recommendedBuckets requires a snapshot-managed table; $path " +
          "has no manifest naming its data files")
    }
    // the manifest read above is UNLOCKED (this is a read-only advisory
    // API): a concurrent commit can delete a just-expired file in the
    // window between the listing and the status call — treat a vanished
    // file as 0 bytes rather than throwing from a sizing helper
    val bytes = files.iterator
      .map(f => scala.util.Try(
        fs.getFileStatus(new Path(root, f)).getLen).getOrElse(0L)).sum
    // count() over parquet resolves from footer row counts (no column
    // scan); the snapshot read pins the same file list the bytes saw —
    // a file expired between the two resolutions reads as 0 both ways
    val rows = scala.util.Try(Snapshots.readTable(spark, root).count())
      .getOrElse(0L)
    math.max(unitsFor(bytes, targetBytesPerBucket),
      unitsFor(rows, targetRowsPerBucket))
  }

  /** AUTO-WIDEN policy (r13 verdict task #4) — the round-13 manual
    * knob turned into a decision the maintenance cycle makes itself:
    * consult [[recommendedBuckets]] against the table's recorded
    * count and [[rebucket]] when the recommendation exceeds it by
    * `widenFactor` (hysteresis — a recommendation drifting a few
    * percent past the layout must not thrash a full-table rewrite
    * every cycle). Never NARROWS: a narrow recommendation can be a
    * transient (retention just swept; a probe table mid-load), and
    * shrinking is a deliberate operator action with [[rebucket]].
    * Returns the new count when it widened, None otherwise (missing
    * table, raw layout, or within hysteresis). Callers bound the work
    * per cycle — the mart widens at most ONE table per sweep. */
  def autoWiden(spark: SparkSession, path: String, keys: Seq[String],
                targetBytesPerBucket: Long = DefaultBucketTargetBytes,
                targetRowsPerBucket: Long = DefaultBucketTargetRows,
                widenFactor: Double = 2.0): Option[Int] = {
    require(widenFactor >= 1.0,
      s"widenFactor must be >= 1 (got $widenFactor)")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path)) ||
      Snapshots.currentFiles(fs, new Path(path)).isEmpty) return None
    val cur = readOrWriteBucketCount(fs, path, DefaultUpsertBuckets)
    val rec = recommendedBuckets(spark, path, targetBytesPerBucket,
      targetRowsPerBucket)
    if (rec >= cur * widenFactor) {
      rebucket(spark, path, keys, rec)
      Some(rec)
    } else None
  }

  /** Read a table written by [[upsertKeyed]] without its layout column
    * (snapshot-pinned when managed — see [[readCombined]]). */
  def readKeyed(spark: SparkSession, path: String): DataFrame =
    Snapshots.readTable(spark, new Path(path)).drop("__bucket")

  /** Rows of an [[upsertKeyed]] table whose key MAY be in `forKeys` —
    * reads ONLY the bucket dirs `forKeys` hashes into (callers still
    * join/filter exactly; this is the pruning step that keeps a
    * per-batch state lookup O(touched buckets), never O(table)).
    * `forKeys` must be a small frame (its distinct buckets are
    * collected — ≤ nBuckets values). */
  def readKeyedFor(spark: SparkSession, path: String,
                   forKeys: DataFrame, keys: Seq[String]): Option[DataFrame] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return None
    val n = readOrWriteBucketCount(fs, path, DefaultUpsertBuckets)
    val touched = forKeys.select(bucketOf(keys, n).as("__b"))
      .distinct().collect().map(_.getInt(0))
    val snap = Snapshots.currentFiles(fs, new Path(path)).isDefined
    liveTouched(spark, fs, path, touched.toIndexedSeq, snap)
      .map(_.drop("__bucket"))
  }

  /** The table's recorded bucket count, creating the marker on first
    * write. The snapshot manifest's `nbuckets` line is authoritative
    * when present — it commits ATOMICALLY with the layout it describes
    * ([[rebucket]]); the sidecar `.nbuckets` file beside the table
    * (not inside it — partition discovery must only see `__bucket=`
    * dirs) covers raw tables and pre-rebucket manifests. */
  private def readOrWriteBucketCount(fs: FileSystem, path: String,
                                     requested: Int): Int =
    Snapshots.currentBucketCount(fs, new Path(path)).getOrElse {
      val marker = new Path(path + ".nbuckets")
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val n = try scala.io.Source.fromInputStream(in).mkString.trim.toInt
          finally in.close()
        n
      } else {
        fs.mkdirs(marker.getParent)
        val out = fs.create(marker, true)
        try out.write(requested.toString.getBytes("UTF-8")) finally out.close()
        requested
      }
    }

  /** Promote `staged` over `live` via move-aside → promote → drop-old:
    * no point in this sequence has zero live copies on disk. Hadoop FS
    * mutations report failure by RETURNING false, not throwing — an
    * unchecked rename followed by a delete would silently destroy the
    * only copy, so every step is checked. */
  private def swapDir(fs: FileSystem, staged: Path, live: Path, old: Path): Unit = {
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(s"$what failed for $live")
    fs.mkdirs(old.getParent)
    if (fs.exists(old)) {
      // leftover from a crash inside a previous swap: only safe to drop
      // when a live copy exists; otherwise it IS the last copy — restore
      if (fs.exists(live)) must(fs.delete(old, true), "delete stale .old")
      else must(fs.rename(old, live), "restore .old")
    }
    val hadLive = fs.exists(live)
    if (hadLive) must(fs.rename(live, old), "move live aside")
    must(fs.rename(staged, live), "promote staged")
    if (hadLive) must(fs.delete(old, true), "drop old")
  }

  /** Heal bucket dirs orphaned by a crash mid-swap: a `.old` copy whose
    * live dir is missing is the last copy — restore it; one whose live dir
    * exists is stale — drop it. Runs on the (tiny) `.old` listing only. */
  private def healBuckets(fs: FileSystem, path: String): Unit = {
    val oldRoot = new Path(path + ".old")
    if (!fs.exists(oldRoot)) return
    fs.listStatus(oldRoot).foreach { st =>
      val live = new Path(path, st.getPath.getName)
      if (fs.exists(live)) fs.delete(st.getPath, true)
      else fs.rename(st.getPath, live)
    }
  }

  /** Replace the table at `path` with `df` via stage → move old aside →
    * promote staged → drop old: no point in this sequence has zero live
    * copies on disk. `df` MAY read from `path` itself (it is staged to a
    * side directory before the live table moves). Full-table form — the
    * keyed sinks use the incremental [[upsertKeyed]] instead. */
  def overwriteSwapped(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".staging")
    df.write.mode("overwrite").parquet(tmp.toString)
    swapDir(fs, tmp, new Path(path), new Path(path + ".old-full"))
  }

  /** K7 — debug sink. */
  def debug(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  // ------------------------------------------------------------- streaming

  /** K1 streaming — checkpointed parquet append (exactly-once to files). */
  def streamAppend(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()

  /** K2 streaming — dynamic per-record target via foreachBatch; replayed
    * batches overwrite their own `__batch` partition (idempotent). */
  def streamDynamic(df: DataFrame, topicCol: String, path: String,
                    checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dynamicIdempotent(batch, topicCol, path, batchId)
      }
      .start()

  /** K3 streaming — keyed upsert per micro-batch. The batch id joins the
    * ordering so replayed batches (restart recovery) merge idempotently:
    * re-applying the same (key, order, batch) rows leaves the table
    * unchanged. */
  def streamUpsert(df: DataFrame, keys: Seq[String], order: Seq[String],
                   path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertKeyed(batch.sparkSession,
          batch.withColumn("__upsert_batch", lit(batchId)),
          keys, order :+ "__upsert_batch", path,
          dropCols = Seq("__upsert_batch"))
      }
      .start()
}
