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
  * temporarily dark, but never lose them. */
private[apps] object SurgicalRewrite {

  /** Rewrite `files` (fully-qualified URIs) keeping only `transform`'s
    * output rows, each rewritten file internally ordered by `order`.
    * `tmpDir` must be an underscore-prefixed scratch path on the same
    * filesystem (invisible to readers, removed afterwards). */
  def rewrite(spark: SparkSession, files: Seq[String], tmpDir: String,
              transform: DataFrame => DataFrame,
              order: Seq[Column]): Unit = {
    if (files.isEmpty) return
    val hit = files.sorted
    val lookup = spark.createDataFrame(hit.zipWithIndex).toDF("__f", "__fid")
    val tmp = new Path(tmpDir)
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
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
      val repl = Option(fs.globStatus(new Path(tmp, s"__fid=$i/*.parquet")))
        .getOrElse(Array.empty).headOption.map(_.getPath)
      // aside first: the original's rows stay recoverable at every step
      val bak = new Path(orig.getParent, s".bak-${orig.getName}")
      require(fs.rename(orig, bak), s"rewrite: could not set aside $orig")
      repl.foreach { r => // None ⇔ every row of this file was dropped
        require(fs.rename(r, orig), s"rewrite: could not install $r")
      }
      fs.delete(bak, false)
    }
    fs.delete(tmp, true)
  }
}
