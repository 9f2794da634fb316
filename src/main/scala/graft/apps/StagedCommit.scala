package graft.apps

import org.apache.hadoop.fs.{FileSystem, Path}

/** Manifest-ordered staged commit for multi-directory parquet updates —
  * the crash contract shared by [[IncrementalReleaseApp]] and
  * [[VectorIndexApp]].
  *
  * A writer stages every output under one `_staging` directory, then
  * [[publish]]es: the staged files are enumerated into a manifest
  * (written atomically via temp + rename), moved into their final
  * directories (a bounded rename pool for the bulk; order within it is
  * irrelevant because nothing is observable until the watermark lands),
  * with any path matching `lastFragment` (the watermark/meta marker)
  * moved strictly LAST, serially, after the pool drains. The invariants
  * a replayer can rely on:
  *
  *  - no manifest ⇒ nothing was published — [[heal]] discards the
  *    staging and the writer recomputes;
  *  - manifest present ⇒ the move set is FROZEN — [[heal]] finishes the
  *    remaining moves idempotently (a file already at its destination
  *    is skipped; missing on both sides fails loudly);
  *  - the `lastFragment` marker is visible only after every other file
  *    landed, so a watermark check ("is this batch applied?") can never
  *    observe a half-applied batch as applied.
  *
  * Single writer assumed; staging and destinations must share a
  * filesystem (renames, not copies). */
object StagedCommit {

  /** TEST-ONLY crash injection for replay-heal specs — never set
    * outside tests. `crashBeforeCommit` dies after staging but before
    * the commit manifest exists; `crashAfterMoves = n` dies after the
    * n-th committed file move. */
  private[apps] var crashBeforeCommit: Boolean = false
  private[apps] var crashAfterMoves: Int = Int.MaxValue

  /** Concurrent renames [[publish]] uses for the non-watermark moves.
    * Renames are metadata-only but each is a filesystem round-trip: a
    * delta touching all 256 band prefixes stages a thousand-odd files,
    * and moving them serially on the driver made the commit latency
    * O(files). A small pool hides the per-call latency; the watermark
    * moves are still strictly serial AFTER the pool drains, so the
    * "`lastFragment` visible ⇒ everything landed" invariant holds. */
  private val CommitParallelism = 16

  /** Enumerate the staged files under each `(stagingSubdir → destRoot)`
    * mapping, write the manifest, move everything (`lastFragment` paths
    * last), and remove the staging directory. */
  def publish(fs: FileSystem, staging: Path,
              mappings: Seq[(String, String)],
              lastFragment: String): Unit = {
    if (crashBeforeCommit) throw new IllegalStateException(
      "injected crash: staged but uncommitted")
    val (rest, last) = stagedMoves(fs, staging, mappings, lastFragment)
    writeManifest(fs, staging, rest ++ last)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    moveParallel(fs, rest, counter) // barrier: every non-watermark file
    commitMoves(fs, last, counter)  // … lands before the watermark moves
    fs.delete(staging, true)
  }

  private def moveParallel(fs: FileSystem, moves: Seq[(Path, Path)],
      counter: java.util.concurrent.atomic.AtomicInteger): Unit = {
    if (moves.length <= 1) {
      commitMoves(fs, moves, counter, healing = false); return
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(CommitParallelism, moves.length))
    try {
      val futures = moves.map { case (src, dst) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = moveOne(fs, src, dst, counter, healing = false)
        })
      }
      // .get() rethrows wrapped — unwrap so callers (and the crash-
      // injection specs) see the original failure, not the pool's
      futures.foreach { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause }
      }
    } finally pool.shutdownNow()
  }

  /** Complete (or discard) a torn publish left by a crash: a staging
    * dir WITH a commit manifest finishes its moves idempotently; one
    * WITHOUT a manifest never published anything and is removed. */
  def heal(fs: FileSystem, staging: Path): Unit = {
    if (!fs.exists(staging)) return
    val manifest = new Path(staging, "COMMIT")
    if (fs.exists(manifest)) {
      val in = fs.open(manifest)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      commitMoves(fs, lines.map { l =>
        val Array(s, d) = l.split('\t'); (new Path(s), new Path(d))
      }, healing = true)
    }
    fs.delete(staging, true)
  }

  private def stagedMoves(fs: FileSystem, staging: Path,
                          mappings: Seq[(String, String)], lastFragment: String)
      : (Seq[(Path, Path)], Seq[(Path, Path)]) = {
    def files(root: Path): Seq[Path] = {
      if (!fs.exists(root)) return Nil
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) {
        val p = it.next().getPath
        if (!p.getName.startsWith("_") && !p.getName.startsWith(".")) buf += p
      }
      buf.toSeq
    }
    // listFiles returns scheme-qualified paths — qualify the roots the
    // same way before stripping them off. lastFragment matches the
    // STAGING-RELATIVE path only: matching the absolute destination
    // would misclassify every move under a destination root that
    // happens to contain the fragment (e.g. /warehouse/meta/corpus-idx)
    // and void the watermark-moves-last invariant.
    val all = mappings.flatMap { case (sub, dest) =>
      val root = new Path(staging, sub)
      files(root).map { p =>
        val q = fs.makeQualified(root).toString + "/"
        require(p.toString.startsWith(q), s"staged file $p outside root $q")
        val rel = p.toString.stripPrefix(q)
        (p, new Path(dest + "/" + rel), "/" + rel)
      }
    }
    val (last, rest) = all.partition(_._3.contains(lastFragment))
    (rest.map { case (src, dst, _) => (src, dst) },
      last.map { case (src, dst, _) => (src, dst) })
  }

  private def writeManifest(fs: FileSystem, staging: Path,
                            moves: Seq[(Path, Path)]): Unit = {
    // duplicate destinations must never enter the FROZEN manifest: a
    // first-run collision failure would otherwise be "resolved" by the
    // next restart's heal replay overwriting the first writer's file —
    // the moveOne require only survives the crash contract if the
    // manifest itself is collision-free
    val dups = moves.groupBy(_._2).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"staged commit maps multiple sources to ${dups.mkString(", ")}")
    val tmp = new Path(staging, ".COMMIT.tmp")
    val out = fs.create(tmp, true)
    try out.write(moves.map { case (s, d) => s"$s\t$d" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new Path(staging, "COMMIT")),
      "could not publish commit manifest")
  }

  /** Idempotent, resumable move pass: a file already at its destination
    * (a replayed crash-interrupted commit) is skipped; missing on BOTH
    * sides is corruption and fails loudly. */
  private def commitMoves(fs: FileSystem, moves: Seq[(Path, Path)],
      counter: java.util.concurrent.atomic.AtomicInteger =
        new java.util.concurrent.atomic.AtomicInteger(0),
      healing: Boolean = false): Unit =
    moves.foreach { case (src, dst) => moveOne(fs, src, dst, counter, healing) }

  private def moveOne(fs: FileSystem, src: Path, dst: Path,
      counter: java.util.concurrent.atomic.AtomicInteger,
      healing: Boolean): Unit = {
    if (counter.getAndIncrement() >= crashAfterMoves)
      throw new IllegalStateException(
        s"injected crash: commit interrupted mid-moves")
    if (fs.exists(src)) {
      fs.mkdirs(dst.getParent)
      if (fs.exists(dst)) {
        // src AND dst both present. On a FIRST-RUN publish that is a
        // destination collision (duplicate manifest entries, a violated
        // single-writer assumption) and silently replacing dst would be
        // data loss — fail loudly with both files intact. On a HEAL
        // replay the manifest froze the intended state before the
        // crash, so the staged src is authoritative: an out-of-band dst
        // is replaced rather than wedging every subsequent heal forever.
        require(healing, s"commit destination already exists: $dst")
        fs.delete(dst, false)
      }
      require(fs.rename(src, dst), s"commit move failed: $src -> $dst")
    } else require(fs.exists(dst),
      s"commit lost a file (neither $src nor $dst exists)")
  }
}
