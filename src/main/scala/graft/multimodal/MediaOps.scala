package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal (image/audio/video) column handling.
  *
  * Media travels as an opaque `binary` column plus typed metadata — the
  * schema/partitioning/batching plumbing is real and tested; only the
  * codec call itself is stubbed (no image/audio libraries exist in this
  * environment). The reference has no media path; this extends the engine
  * to the training-data-pipeline surface.
  *
  * Scale shape: decode runs in `mapPartitions` so a real codec (JNI/FFI)
  * amortizes per-partition init (model load, decoder context) across the
  * partition's records — the same batch shape a vectorized-UDF decode
  * would have. Output is columnar-friendly fixed-width features; the
  * binary payload is dropped as early as possible so shuffles never carry
  * media bytes.
  */
object MediaOps {

  /** An opaque media payload: id + bytes + declared format + capture ts. */
  final case class MediaRecord(mediaId: Long, content: Array[Byte],
                               format: String, tsMillis: Long)

  /** Decoded per-media features (what a real decoder would emit). */
  final case class MediaFeatures(mediaId: Long, format: String,
                                 nBytes: Long, contentSha: String,
                                 width: Int, height: Int, durationMs: Long)

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** STUB CODEC — a real implementation would decode image/audio bytes
    * here (e.g. libjpeg/ffmpeg via JNI, initialized once per partition).
    * This deterministic stand-in derives pseudo-dimensions from a content
    * hash so the pipeline around it (schema, partition batching, feature
    * extraction, tests) is fully exercisable offline. */
  /** The ONE engine-side definition of the md5→int64 fold the stub codec
    * and the m3 scoring head share (and the DuckDB oracles mirror as
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`): lowercase-hex digest,
    * first 15 hex chars as a non-negative int64. */
  private[graft] def md5Fold60(bytes: Array[Byte],
                               md: MessageDigest): (String, Long) = {
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    (hex, java.lang.Long.parseLong(hex.substring(0, 15), 16))
  }

  private def stubDecode(r: MediaRecord, md: MessageDigest): MediaFeatures = {
    val (hex, h) = md5Fold60(r.content, md)
    MediaFeatures(
      mediaId = r.mediaId,
      format = r.format,
      nBytes = r.content.length.toLong,
      contentSha = hex,
      width = (h % 1920L).toInt + 1,
      height = ((h / 1920L) % 1080L).toInt + 1,
      durationMs = if (r.format == "image") 0L else h % 600000L)
  }

  /** Decode/feature-extract: per-partition batched, codec state reused
    * across the partition (the `MessageDigest` stands in for a decoder
    * context a real codec would pay to initialize). */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition init, reused
      it.map(r => stubDecode(r, md))
    }

  /** Frame-sample stand-in: deterministic sample offsets for a media item
    * (what frame extraction would seek to), n evenly-spaced points. */
  def sampleOffsets(durationMs: Long, n: Int): Seq[Long] =
    if (durationMs <= 0 || n <= 0) Seq.empty
    else (0 until n).map(i => durationMs * (2L * i + 1) / (2L * n))

  /** Batched model-inference harness — the GPU/accelerator scoring shape:
    * records grouped into ≤`maxBatch`-item batches WITHIN each partition
    * and scored batch-at-a-time against a model handle initialized ONCE
    * per partition. `it.grouped` is lazy, so executor memory holds one
    * batch of inputs (plus its outputs) at a time — never the partition —
    * and nothing is shuffled: at 100 TB the partition count is the
    * parallelism knob and maxBatch the device-memory knob, independently.
    * The model must return exactly one output per input (enforced — a
    * silently-dropping model would otherwise skew downstream counts).
    * Batch composition is partition-order-dependent by nature; anything
    * oracle-visible must be a pure per-record function of the input
    * (spec-asserted batch-size invariance pins exactly that). */
  def inferBatched[I, O: Encoder, M](ds: Dataset[I], maxBatch: Int)(
      init: () => M)(score: (M, Seq[I]) => Seq[O]): Dataset[O] = {
    require(maxBatch > 0, s"maxBatch must be positive (got $maxBatch)")
    ds.mapPartitions { it =>
      val model = init() // once per partition, reused across its batches
      it.grouped(maxBatch).flatMap { batch =>
        val out = score(model, batch)
        require(out.length == batch.length,
          s"model returned ${out.length} outputs for ${batch.length} inputs")
        out
      }
    }
  }
}
