package graft.apps

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusReleaseAppSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("release: cleaned, decontaminated, sampled, mixed, split, packed — and deterministic") {
    val out = Files.createTempDirectory("release").toString + "/corpus"
    CorpusReleaseApp.release(spark, sfDir, out)
    val released = spark.read.parquet(out)
    val ids = released.select("doc_id").as[Long].collect().toSet
    assert(ids.nonEmpty)

    // nothing contaminated survived
    val contaminated = graft.queries.TextQueries
      .queries("c2_decontaminate")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(contaminated).isEmpty)

    // every released doc passed the clean gate
    val clean = graft.queries.TextQueries
      .queries("c1_clean_corpus")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(clean))

    val rows = released
      .select("doc_id", "source", "epoch", "split", "bucket", "seq_id", "wc")
      .as[(Long, String, Long, String, Long, Long, Long)].collect()

    // mixing: every kept doc carries epochs exactly 1..rep, rep uniform
    // per source
    val bySrcDoc = rows.groupBy(r => (r._2, r._1))
    bySrcDoc.foreach { case ((_, _), rs) =>
      val epochs = rs.map(_._3).sorted.toSeq
      assert(epochs == (1L to epochs.length).toSeq, s"epochs $epochs")
    }
    val repsPerSource = bySrcDoc.toSeq
      .groupBy(_._1._1).view.mapValues(_.map(_._2.length).distinct).toMap
    repsPerSource.foreach { case (src, reps) =>
      assert(reps.size == 1 && reps.head >= 1 && reps.head <= 3,
        s"$src repetition $reps")
    }

    // split integrity: a document's epochs never straddle splits
    rows.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.map(_._4).distinct.length == 1, s"doc $id straddles splits")
    }
    val bySplit = rows.groupBy(_._4).view.mapValues(_.length).toMap
    // ALL THREE splits must be populated — the regression this guards:
    // reusing the split hash for sampling keeps only bucket<rate_pct<=80
    // rows, which would make validation and test empty-by-construction.
    assert(bySplit.keySet == Set("train", "validation", "test"),
      s"missing splits: ${Set("train", "validation", "test") -- bySplit.keySet}")
    assert(bySplit.values.sum == rows.length)

    // packing: per (split, bucket) the seq ids are contiguous from 0 and
    // every instance's tokens are counted exactly once
    rows.groupBy(r => (r._4, r._5)).foreach { case (_, rs) =>
      val seqs = rs.map(_._6).distinct.sorted.toSeq
      assert(seqs == (0L until seqs.length).toSeq, s"seq gap: $seqs")
    }

    // scan sharing: the near-dup stage and the decontamination stage run
    // off ONE cached shingle frame, so the whole release plan touches
    // documents.parquet at most 3× (shingles, clean gate, source/wc
    // fetch) — the unshared form shingled twice and scanned 4×. Cached
    // relations are counted ONCE each (two InMemoryTableScans of the
    // same relation share one underlying file scan).
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def docScans(p: SparkPlan, seen: java.util.IdentityHashMap[AnyRef, AnyRef]): Int =
      p.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => 1
        case c: InMemoryTableScanExec =>
          if (seen.put(c.relation.cacheBuilder, c.relation.cacheBuilder) == null)
            docScans(c.relation.cachedPlan, seen)
          else 0
      }.sum
    val frame = CorpusReleaseApp.releaseFrame(spark, sfDir)
    val nScans = docScans(frame.queryExecution.executedPlan,
      new java.util.IdentityHashMap[AnyRef, AnyRef]())
    assert(nScans <= 3, s"documents scanned $nScans times — shingle frame not shared")

    // layout: a consumer reads its split by DIRECTORY PRUNING (planning
    // time), and (bucket, seq-range) predicates reach the scan as pushed
    // filters over row-groups clustered by the in-partition sort
    val t = spark.read.parquet(out)
    assert(graft.sources.Layout.scannedPartitions(
      t.filter(col("split") === "train")) == 1,
      "train read must prune to one partition directory")
    val planStr = t.filter(col("bucket") === 3 && col("seq_id") <= 1)
      .queryExecution.executedPlan.toString
    assert(planStr.contains("EqualTo(bucket,3)") &&
      planStr.contains("LessThanOrEqual(seq_id,1)"),
      s"bucket/seq filters not pushed:\n$planStr")
    // within-file clustering: every parquet file is sorted by
    // (bucket, seq_id), which is what makes those pushed filters SKIP
    // row-groups instead of merely re-checking every row
    val byFile = t.withColumn("__f", input_file_name())
      .select("__f", "bucket", "seq_id").collect()
      .groupBy(_.getString(0))
    byFile.foreach { case (f, rs) =>
      val order = rs.map(r => (r.getLong(1), r.getLong(2))).toSeq
      assert(order == order.sorted, s"file $f not clustered by (bucket, seq_id)")
    }

    // re-running yields the IDENTICAL release (pure function of content)
    val out2 = Files.createTempDirectory("release2").toString + "/corpus"
    CorpusReleaseApp.release(spark, sfDir, out2)
    val again = spark.read.parquet(out2)
      .select("doc_id", "epoch", "split", "bucket", "seq_id")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    val first = released
      .select("doc_id", "epoch", "split", "bucket", "seq_id")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(again == first)
  }
}
