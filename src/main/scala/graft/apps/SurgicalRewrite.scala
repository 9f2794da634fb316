package graft.apps

import java.net.URI

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-place surgical rewrite of a bounded set of parquet files — the
  * shared engine of the takedown operations ([[IncrementalReleaseApp]]
  * `.retract`, [[VectorIndexApp]]`.retract`).
  *
  * ONE Spark job regardless of how many files are hit: the hit list is
  * read as a single relation, each row rejoins its file's ordinal via
  * `input_file_name` (raise_error if a row matches no hit file —
  * silently losing kept rows is the one unacceptable failure), the
  * transform drops the target rows, and the write fans survivors back
  * out into one directory per original file. Each swap then passes
  * through a dot-prefixed aside copy (invisible to parquet readers), so
  * every intermediate state still holds one complete copy of the kept
  * rows — a crash can orphan an aside file or leave a file's rows
  * temporarily dark, but never lose them. [[heal]] (run by callers
  * BEFORE takedown discovery, and per-directory at [[rewrite]] entry)
  * repairs any torn swap: a `.bak-` whose original is missing is
  * restored, a leftover one whose original landed is removed — so a
  * crashed takedown's kept rows become visible again and the REPLAYED
  * takedown (the operator retries a failed retraction) completes it. */
private[apps] object SurgicalRewrite {

  /** TEST-ONLY crash injection for the torn-swap heal specs — never set
    * outside tests. Dies after the n-th aside rename, BEFORE that
    * file's replacement is installed (the dark-rows window). */
  private[apps] var crashAfterAside: Int = Int.MaxValue

  /** Repair torn swaps under `root` (recursive): restore every
    * `.bak-f` whose `f` is missing (crash between aside and install —
    * the rows' only copy), delete every `.bak-f` whose `f` exists
    * (crash between install and cleanup — the swap completed). After
    * a heal the tree is a consistent pre- or post-swap state per file,
    * and replaying the takedown converges it. Callers MUST heal before
    * takedown DISCOVERY: rows visible only in a `.bak-` would dodge
    * the hit-file scan and silently survive the retraction. */
  def heal(fs: org.apache.hadoop.fs.FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    val it = fs.listFiles(root, true)
    val baks = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.startsWith(".bak-")) baks += p
    }
    baks.foreach { p =>
      val orig = new Path(p.getParent, p.getName.stripPrefix(".bak-"))
      if (!fs.exists(orig))
        require(fs.rename(p, orig), s"heal: could not restore $p")
      else fs.delete(p, false)
    }
  }

  /** Membership gate for the takedown paths. A small id set stays a
    * literal In-predicate (it pushes down to parquet row-group stats);
    * above [[InlineIdMax]] ids the same semantics run as a BROADCAST
    * semi/anti join — expression-tree size and per-row eval cost stay
    * O(1) instead of growing with the takedown size. */
  private[apps] val InlineIdMax = 1000

  private def idsFrame(spark: SparkSession, ids: Seq[Long],
                       idCol: String): DataFrame = {
    import spark.implicits._
    ids.toDF(idCol)
  }

  /** Rows of `df` whose `idCol` IS in `ids` (takedown discovery).
    * `idCol` must be non-null (it is a key in every caller): the two
    * shapes treat null differently (In-filter drops, semi-join drops —
    * but [[excluding]]'s pair diverges), so nullable ids are out of
    * contract. */
  private[apps] def matching(df: DataFrame, ids: Seq[Long],
                             idCol: String): DataFrame =
    if (ids.length <= InlineIdMax) df.filter(col(idCol).isin(ids: _*))
    else df.join(broadcast(idsFrame(df.sparkSession, ids, idCol)),
      Seq(idCol), "left_semi")

  /** Rows of `df` whose `idCol` is NOT in `ids` (the kept rows).
    * `idCol` must be non-null: `!isin` evaluates null to null (row
    * dropped) while the anti join would keep it — the switch at
    * [[InlineIdMax]] must never change a verdict. */
  private[apps] def excluding(df: DataFrame, ids: Seq[Long],
                              idCol: String): DataFrame =
    if (ids.length <= InlineIdMax) df.filter(!col(idCol).isin(ids: _*))
    else df.join(broadcast(idsFrame(df.sparkSession, ids, idCol)),
      Seq(idCol), "left_anti")

  /** Files of `df` (a parquet scan frame) holding any of `ids` — the
    * takedown discovery step. The two membership shapes ORDER the
    * nondeterministic `input_file_name()` differently on purpose: the
    * small path filters FIRST (a Project containing input_file_name is
    * nondeterministic, and Catalyst refuses to push predicates through
    * it — attaching the column before the filter would turn a pushed
    * row-group-skipping In-filter into a full scan); the large path
    * must attach it before its join (the column is only defined in the
    * scan stage), which costs nothing since a join side never pushes
    * literal predicates anyway. */
  private[apps] def hitFiles(df: DataFrame, ids: Seq[Long],
                             idCol: String): Seq[String] =
    hitFilesFrame(df, ids, idCol).collect().map(_.getString(0)).toSeq

  /** The discovery FRAME behind [[hitFiles]], exposed separately so the
    * spec pins the pushdown shape of the real production plan (not a
    * hand-built copy of it). */
  private[apps] def hitFilesFrame(df: DataFrame, ids: Seq[Long],
                                  idCol: String): DataFrame =
    (if (ids.length <= InlineIdMax)
      df.filter(col(idCol).isin(ids: _*))
        .select(input_file_name().as("f"))
    else
      df.withColumn("f", input_file_name())
        .join(broadcast(idsFrame(df.sparkSession, ids, idCol)),
          Seq(idCol), "left_semi")
        .select("f"))
      .distinct()

  /** Rewrite `files` (fully-qualified URIs) keeping only `transform`'s
    * output rows, each rewritten file internally ordered by `order`.
    * `tmpDir` must be an underscore-prefixed scratch path on the same
    * filesystem (invisible to readers, removed afterwards). */
  def rewrite(spark: SparkSession, files: Seq[String], tmpDir: String,
              transform: DataFrame => DataFrame,
              order: Seq[Column]): Unit = {
    val tmp = new Path(tmpDir)
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (files.isEmpty) {
      // a replayed takedown whose targets are already gone discovers
      // nothing — but a stale crash marker must still be retired, and
      // ONLY after healing under it: deleting the marker first would
      // disarm every caller's marker-gated heal while dark .bak rows
      // still exist. rewrite owns the marker lifecycle end-to-end
      // rather than trusting every caller to have healed already.
      if (fs.exists(tmp)) {
        heal(fs, tmp.getParent)
        fs.delete(tmp, true)
      }
      return
    }
    val hit = files.sorted
    val lookup = spark.createDataFrame(hit.zipWithIndex).toDF("__f", "__fid")
    // belt-and-braces: repair torn swaps in the hit files' own
    // directories before touching anything (a stale .bak- would make
    // the aside rename below fail; a missing original would read as
    // zero rows). Callers additionally heal the whole root BEFORE
    // discovery — a dark file outside the hit list is their problem.
    hit.map(f => new Path(new URI(f)).getParent).distinct
      .foreach(heal(fs, _))
    val tagged = spark.read.parquet(hit: _*)
      .withColumn("__f", input_file_name())
      .join(broadcast(lookup), Seq("__f"), "left")
      .withColumn("__fid", when(col("__fid").isNull,
          raise_error(concat(lit("rewrite: unmatched input file "), col("__f"))))
        .otherwise(col("__fid")))
      .drop("__f")
    transform(tagged)
      .repartition(hit.length, col("__fid"))
      .sortWithinPartitions(col("__fid") +: order: _*)
      .write.mode("overwrite").partitionBy("__fid").parquet(tmp.toString)
    hit.zipWithIndex.foreach { case (f, i) =>
      val orig = new Path(new URI(f))
      val replAll = Option(fs.globStatus(new Path(tmp, s"__fid=$i/*.parquet")))
        .getOrElse(Array.empty)
      // the repartition above writes EXACTLY one file per __fid; if a
      // future change breaks that invariant, a headOption here would
      // silently drop every survivor row beyond the first file
      require(replAll.length <= 1,
        s"rewrite: ${replAll.length} replacement files for __fid=$i " +
          s"(expected at most 1 — survivor rows would be dropped)")
      val repl = replAll.headOption.map(_.getPath)
      // aside first: the original's rows stay recoverable at every step
      val bak = new Path(orig.getParent, s".bak-${orig.getName}")
      require(fs.rename(orig, bak), s"rewrite: could not set aside $orig")
      if (i >= crashAfterAside) throw new IllegalStateException(
        s"injected crash: rewrite interrupted after aside $i")
      repl.foreach { r => // None ⇔ every row of this file was dropped
        require(fs.rename(r, orig), s"rewrite: could not install $r")
      }
      fs.delete(bak, false)
    }
    fs.delete(tmp, true)
  }
}
