package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** CDC-envelope style per-record transforms.
  *
  * Mirrors the reference's DWD projection/filter family:
  *  - tolerant JSON parse-or-drop       (`app/dim/DimApp.java:60-74`)
  *  - map-column projection `data['x']` (`app/dwd/DwdTradeOrderDetail.java:34-119`)
  *  - CDC event predicates              (`app/dwd/DwdCancelOrderDetail.java:62-67`)
  *  - conditional delta expressions     (`app/dwd/DwdTradeCartAdd.java:33,42-47`)
  *  - config-driven column whitelist    (`app/dim/func/DimTableProcessFunction.java:90-93`)
  *
  * All expressed as Catalyst expressions (no UDFs) so parse + projection
  * stay in whole-stage codegen and `from_json` pushdown/pruning applies.
  */
object CdcOps {

  /** P1 — tolerant parse-or-drop (the reference drops Maxwell bootstrap /
    * malformed rows the same way). PERMISSIVE `from_json` yields an
    * all-null struct (not a null struct) for malformed input, so the
    * reliable drop signal is a corrupt-record column inside the schema. */
  def parseOrDrop(df: DataFrame, jsonCol: String, schema: StructType,
                  parsedName: String = "j"): DataFrame = {
    val corrupt = "_corrupt_record"
    val withCorrupt = schema.add(corrupt, StringType)
    df.withColumn(parsedName,
        from_json(col(jsonCol), withCorrupt,
          Map("columnNameOfCorruptRecord" -> corrupt)))
      .filter(col(parsedName).isNotNull &&
        col(s"$parsedName.$corrupt").isNull)
  }

  /** P1b — parse-or-QUARANTINE: like [[parseOrDrop]] but malformed rows
    * are kept, tagged, and carry the raw payload — the dead-letter
    * side-output of the reference's dirty-data stream (`app/dim/
    * DimApp.java:60-74` logs-and-drops; production pipelines route to a
    * quarantine topic instead so bad data is debuggable). Single pass,
    * single parse; downstream splits on `__quarantined`. */
  def parseOrQuarantine(df: DataFrame, jsonCol: String, schema: StructType,
                        parsedName: String = "j"): DataFrame = {
    val corrupt = "_corrupt_record"
    val withCorrupt = schema.add(corrupt, StringType)
    df.withColumn(parsedName,
        from_json(col(jsonCol), withCorrupt,
          Map("columnNameOfCorruptRecord" -> corrupt)))
      .withColumn("__quarantined",
        col(parsedName).isNull || col(s"$parsedName.$corrupt").isNotNull)
  }

  /** P2 — project fields out of a map column: data['id'] AS id, ... */
  def mapProjection(data: Column, fields: Seq[String]): Seq[Column] =
    fields.map(f => element_at(data, f).as(f))

  /** P4 — conditional delta: insert ⇒ full value, update ⇒ new - old
    * (cart-add increment semantics). */
  def conditionalDelta(opType: Column, newVal: Column, oldVal: Column): Column =
    when(opType === "insert", newVal).otherwise(newVal - oldVal)

  /** P5 — config-driven column whitelist over a map column. */
  def filterColumns(data: Column, allowed: Seq[String]): Column = {
    val allowedArr = array(allowed.map(lit): _*)
    map_filter(data, (k, _) => array_contains(allowedArr, k))
  }

  /** X1-style multiway split for genuine multi-SINK fan-out: the upstream
    * is persisted once so each branch's sink reads the parsed frame, not
    * the raw source — the Spark equivalent of Flink side outputs
    * (`app/dwd/DwdTrafficBaseLogSplit.java:41-48,113-139`). N branches off
    * an unpersisted frame would re-scan + re-parse the source N times,
    * which at 100 TB is N full scans.
    *
    * Caller MUST `unpersist()` the returned handle after all sinks run.
    * When branches are re-unioned into ONE output instead, don't split at
    * all — use a single-pass `when` cascade (see `x1_split_route`).
    */
  def splitBy(df: DataFrame, tagCol: String, tags: Seq[String])
      : (DataFrame, Map[String, DataFrame]) = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (cached, tags.map(t => t -> cached.filter(col(tagCol) === t)).toMap)
  }
}
