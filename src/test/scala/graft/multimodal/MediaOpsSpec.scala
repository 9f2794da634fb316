package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaOps.{MediaFeatures, MediaRecord}

class MediaOpsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    MediaRecord(1, "jpeg-bytes-here".getBytes("UTF-8"), "image", 1000L),
    MediaRecord(2, "wav-bytes".getBytes("UTF-8"), "audio", 2000L),
    MediaRecord(3, Array.emptyByteArray, "image", 3000L))

  test("decodeFeatures is deterministic and schema-stable") {
    val a = MediaOps.decodeFeatures(fixture.toDS()).collect().sortBy(_.mediaId)
    val b = MediaOps.decodeFeatures(fixture.toDS()).collect().sortBy(_.mediaId)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.mediaId).toSeq == Seq(1L, 2L, 3L))
  }

  test("features carry byte counts and bounded dimensions") {
    val f = MediaOps.decodeFeatures(fixture.toDS()).collect()
      .map(x => x.mediaId -> x).toMap
    assert(f(1).nBytes == 15 && f(3).nBytes == 0)
    f.values.foreach { x: MediaFeatures =>
      assert(x.width >= 1 && x.width <= 1920)
      assert(x.height >= 1 && x.height <= 1080)
      assert(x.contentSha.length == 32)
    }
    assert(f(1).durationMs == 0L) // images have no duration
    assert(f(2).durationMs >= 0L)
  }

  test("decode runs partition-batched (survives multi-partition datasets)") {
    val many = (1L to 100L).map(i =>
      MediaRecord(i, s"payload-$i".getBytes("UTF-8"), "image", i))
    val got = MediaOps.decodeFeatures(many.toDS().repartition(7)).collect()
    assert(got.length == 100)
    assert(got.map(_.contentSha).distinct.length == 100)
  }

  test("sampleOffsets are evenly spaced mid-bucket points") {
    assert(MediaOps.sampleOffsets(1000, 4) == Seq(125L, 375L, 625L, 875L))
    assert(MediaOps.sampleOffsets(0, 4).isEmpty)
    assert(MediaOps.sampleOffsets(1000, 0).isEmpty)
  }

  test("m2's offset column formula equals sampleOffsets for positive durations") {
    for (dur <- Seq(1L, 7L, 8L, 123456L, 599999L)) {
      val colFormula = (0 until 4).map(i => dur * (2 * i + 1) / 8)
      assert(colFormula == MediaOps.sampleOffsets(dur, 4), s"dur=$dur")
    }
  }

  test("inferBatched: one init per partition, batches capped, exact coverage") {
    MediaOpsSpec.initCount.set(0)
    MediaOpsSpec.batchSizes.clear()
    val ids = (1L to 100L)
    val got = MediaOps.inferBatched(ids.toDS().repartition(4), 8)(
      () => { MediaOpsSpec.initCount.incrementAndGet(); () }) { (_, batch) =>
      batch.foreach(_ => ())
      MediaOpsSpec.batchSizes.add(batch.length)
      batch.map(_ * 10)
    }.collect()
    // local[*] runs tasks in one JVM, so the static counters see every task
    assert(MediaOpsSpec.initCount.get() == 4,
      s"expected 4 partition inits, saw ${MediaOpsSpec.initCount.get()}")
    import scala.jdk.CollectionConverters._
    val sizes = MediaOpsSpec.batchSizes.asScala.toSeq
    assert(sizes.nonEmpty && sizes.forall(_ <= 8),
      s"a batch exceeded maxBatch: $sizes")
    assert(got.sorted.toSeq == ids.map(_ * 10)) // each record exactly once
  }

  test("inferBatched: output is batch-size invariant for per-record models") {
    val ds = (1L to 50L).toDS().repartition(3)
    def run(b: Int) = MediaOps.inferBatched(ds, b)(() => ()) { (_, batch) =>
      batch.map(x => x * x + 1)
    }.collect().sorted.toSeq
    assert(run(1) == run(7) && run(7) == run(64))
  }

  test("inferBatched: a model that drops outputs fails loudly") {
    val ds = (1L to 10L).toDS().coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      MediaOps.inferBatched(ds, 4)(() => ()) { (_, batch) =>
        batch.drop(1).map(identity)
      }.collect()
    }
    assert(Option(e.getMessage).exists(_.contains("outputs")) ||
      Option(e.getCause).flatMap(c => Option(c.getMessage))
        .exists(_.contains("outputs")))
  }
}

object MediaOpsSpec {
  val initCount = new java.util.concurrent.atomic.AtomicInteger(0)
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}
