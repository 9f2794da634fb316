package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.StableHash
import graft.operators.CdcOps
import graft.sources.Tables

/** CDC-envelope and serialization operators (SURVEY §2 S3 / P2 / P7 / P8 /
  * A7) over the driver's tables.
  *
  * The reference consumes a Maxwell binlog envelope
  * `{database, table, type, ts, data{…}, old{…}}`
  * (`app/dim/func/DimTableProcessFunction.java:68-70`) and filters on
  * op type + old-field transitions
  * (`app/dwd/DwdTradeRefundOrderDetail.java:44-46`). There is no binlog
  * here, so `s3_cdc_extract` first RENDERS a deterministic envelope from
  * `events` (to_json), then runs the real machinery — parse-or-drop with
  * the envelope schema, op predicate, old-field transition predicate, map
  * extraction — whose output the oracle reproduces directly from the base
  * table. The envelope round-trip is the operator under test.
  */
object CdcQueries {
  import CoreQueries.Q

  private val envelopeSchema = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", LongType),
    StructField("data", MapType(StringType, StringType)),
    StructField("old", MapType(StringType, StringType))))

  /** S3 — CDC envelope: render Maxwell-style JSON, parse it back with the
    * envelope schema, filter `update` ops whose old-field transitioned,
    * extract typed columns from the `data` map. */
  private val s3CdcExtract: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val mod = col("event_id") % 10
    val op = when(mod <= 5, lit("insert"))
      .when(mod <= 8, lit("update"))
      .otherwise(lit("delete"))
    // Maxwell puts `old` only on updates; to_json drops the null field.
    val raw = ev.select(to_json(struct(
      lit("gmall").as("database"),
      lit("events").as("table"),
      op.as("type"),
      unix_millis(col("ts")).as("ts"),
      map(
        lit("id"), col("event_id").cast("string"),
        lit("uid"), col("user_id").cast("string"),
        lit("etype"), col("event_type")).as("data"),
      when(op === "update", map(lit("etype"), lit("pending")))
        .otherwise(lit(null)).as("old"))).as("raw"))
    CdcOps.parseOrDrop(raw, "raw", envelopeSchema)
      .filter(col("j.type") === "update" &&
        element_at(col("j.old"), "etype").isNotNull &&
        element_at(col("j.data"), "etype") === "purchase")
      .select(
        element_at(col("j.data"), "id").cast("long").as("id"),
        element_at(col("j.data"), "uid").cast("long").as("uid"),
        col("j.ts").as("op_ts"))
      .orderBy("id")
  }

  /** P2 — map-column projection `data['x']`
    * (cf. DwdTradeOrderDetail.java:34-119). */
  private val p2MapProject: Q = (s, d) => {
    val data = map(
      lit("id"), col("event_id").cast("string"),
      lit("etype"), col("event_type"),
      lit("k"), get_json_object(col("props"), "$.k"))
    Tables.events(s, d)
      .select(col("event_id") +: CdcOps.mapProjection(data, Seq("etype", "k")): _*)
      .orderBy("event_id")
  }

  /** P7 — bean→snake_case JSON serialization
    * (the reference serializes DWS beans with a snake-case fastjson config,
    * `util/DorisUtil.java` sink path). */
  private val p7Serialize: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"), to_json(struct(
        col("c_custkey").as("cust_key"),
        col("c_name").as("cust_name"),
        col("c_mktsegment").as("mkt_segment"))).as("payload"))
      .orderBy("c_custkey")

  /** P8/U1 — row-key salting: engine-portable bucket spread
    * (cf. `util/HBaseUtil.java:140-147` `hashCode % buckets`). */
  private val u1SaltBucket: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(StableHash.bucket60(col("user_id").cast("string"), 60).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("bucket")

  /** A7 — field-wise first-non-null merge: each output field independently
    * takes its value from the key's earliest row where that field is
    * present (lab `DwsLeftJoinDuplication05Merge`-style). One pass, one
    * shuffle: min over (order, field) structs, null fields skipped. */
  private val a7FieldMerge: Q = (s, d) => {
    val k = when(col("event_type") === "click",
      get_json_object(col("props"), "$.k"))
    val v = when(col("event_type") === "purchase", col("value"))
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        min(when(k.isNotNull,
          struct(col("ts"), col("event_id"), k.as("k"))))
          .getField("k").as("first_click_k"),
        min(when(v.isNotNull,
          struct(col("ts"), col("event_id"), v.as("v"))))
          .getField("v").as("first_purchase_value"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** M1 — multimodal binary-column features: byte length + content header
    * over an opaque binary payload (the Spark-side plumbing for media
    * columns; the full decode stub lives in graft.multimodal.MediaOps). */
  private val m1MediaFeatures: Q = (s, d) => {
    val bin = col("text").cast("binary")
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(bin).cast("long").as("n_bytes"),
        substring(hex(bin), 1, 8).as("header_hex"))
      .orderBy("doc_id")
  }

  /** M2 — frame sampling plumbing: each media item explodes to its n
    * evenly-spaced sample offsets (what a video decoder would seek to) —
    * map-side Generate, no shuffle, payload bytes never carried past the
    * offset computation. The duration is the deterministic stub decode
    * (stable60 of the payload, as MediaOps.stubDecode derives it); the
    * offset formula is [[graft.multimodal.MediaOps.sampleOffsets]]
    * (equality asserted in MediaOpsSpec). */
  private val m2FrameSample: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("duration_ms",
        graft.functions.StableHash.stable60(col("text")) % 600000)
      .select(col("doc_id"), col("duration_ms"),
        explode(sequence(lit(0L), lit(3L))).as("frame_idx"))
      .withColumn("offset_ms",
        expr("duration_ms * (2 * frame_idx + 1) div 8"))
      .orderBy("doc_id", "frame_idx")

  /** M3 — batched model scoring through the
    * [[graft.multimodal.MediaOps.inferBatched]] harness: a deterministic
    * stub "embedding head" (md5 → int64, one model handle per partition,
    * ≤32-record device batches) scores every document. The VALUE is the
    * plumbing — partition-once model init, bounded batch memory, output
    * arity enforced — while the score stays a pure per-record function
    * so the oracle can reproduce it; the batching mechanics themselves
    * (init count, batch caps, batch-size invariance) are pinned in
    * MediaOpsSpec, which the oracle cannot see. */
  private val m3MediaEmbed: Q = (s, d) => {
    import s.implicits._
    val recs = Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    graft.multimodal.MediaOps.inferBatched(recs, 32)(
      () => java.security.MessageDigest.getInstance("MD5")) { (md, batch) =>
      batch.map { case (id, text) =>
        val (_, h) = graft.multimodal.MediaOps.md5Fold60(
          text.getBytes("UTF-8"), md)
        (id, h % 1000003L)
      }
    }.toDF("doc_id", "embed_q").orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "s3_cdc_extract" -> s3CdcExtract,
    "m3_media_embed" -> m3MediaEmbed,
    "p2_map_project" -> p2MapProject,
    "p7_serialize" -> p7Serialize,
    "u1_salt_bucket" -> u1SaltBucket,
    "a7_field_merge" -> a7FieldMerge,
    "m1_media_features" -> m1MediaFeatures,
    "m2_frame_sample" -> m2FrameSample)

  val oracles: Map[String, String] = Map(
    "s3_cdc_extract" ->
      """SELECT event_id AS id, user_id AS uid, epoch_ms(ts) AS op_ts
        |FROM events
        |WHERE event_id % 10 BETWEEN 6 AND 8 AND event_type = 'purchase'
        |ORDER BY id""".stripMargin,
    "p2_map_project" ->
      """SELECT event_id, event_type AS etype,
        | json_extract_string(props, '$.k') AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "p7_serialize" ->
      """SELECT c_custkey, json_object(
        | 'cust_key', c_custkey, 'cust_name', c_name,
        | 'mkt_segment', c_mktsegment)::VARCHAR AS payload
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "u1_salt_bucket" ->
      """SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 60
        |  AS bucket,
        | COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "a7_field_merge" ->
      """SELECT user_id,
        | (min(CASE WHEN etype = 'click' AND k IS NOT NULL
        |   THEN struct_pack(ts := ts, eid := event_id, k := k) END)).k
        |   AS first_click_k,
        | (min(CASE WHEN etype = 'purchase' AND value IS NOT NULL
        |   THEN struct_pack(ts := ts, eid := event_id, v := value) END)).v
        |   AS first_purchase_value,
        | COUNT(*) AS n_events
        |FROM (SELECT user_id, ts, event_id, event_type AS etype, value,
        |        json_extract_string(props, '$.k') AS k
        |      FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "m1_media_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        | left(hex(encode(text)), 8) AS header_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m3_media_embed" ->
      """SELECT doc_id,
        | ('0x' || substr(md5(text), 1, 15))::BIGINT % 1000003 AS embed_q
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m2_frame_sample" ->
      """SELECT doc_id, dur AS duration_ms, i AS frame_idx,
        | (dur * (2 * i + 1)) // 8 AS offset_ms
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5(text), 1, 15))::BIGINT % 600000 AS dur
        |      FROM documents)
        |CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
