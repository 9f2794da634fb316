package graft.apps

import java.nio.file.Files

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
    assert(bySplit.keySet.subsetOf(Set("train", "validation", "test")))
    assert(bySplit.values.sum == rows.length)

    // packing: per (split, bucket) the seq ids are contiguous from 0 and
    // every instance's tokens are counted exactly once
    rows.groupBy(r => (r._4, r._5)).foreach { case (_, rs) =>
      val seqs = rs.map(_._6).distinct.sorted.toSeq
      assert(seqs == (0L until seqs.length).toSeq, s"seq gap: $seqs")
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
