package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming keyed-state operators — the Structured Streaming forms of the
  * reference's `keyBy + ValueState` patterns. Batch twins live in
  * [[graft.operators.DedupOps]] and `CoreQueries` (A3/A4/A5/P6); the specs
  * in `src/test/scala/graft/streaming/` assert stream == batch on the same
  * fixture, which is the correctness gate for this layer (the driver's
  * DuckDB oracle only sees batch).
  *
  * State semantics mirrored from the reference:
  *  - keep-first per key with TTL        (`app/dws/DwsTradeSkuOrderWindow.java:111-148`)
  *  - once-per-period (per-day UV dedup) (`app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:79-128`)
  *  - is_new repair via first-seen state (`app/dwd/DwdTrafficBaseLogSplit.java:63-97`)
  *  - keep-last upsert (changelog tail)  (`app/lab/DwsLeftJoinDuplication03Last.java:54-79`)
  *
  * Scale notes: all operators are `groupByKey → *GroupsWithState` — state
  * is partitioned by key across executors and checkpointed via the state
  * store (R1); TTLs (W7/W8) bound state size so a 100 TB keyspace cannot
  * accumulate unboundedly. No driver-side state anywhere.
  */
object StatefulOps {

  private implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
  private implicit val stringEnc: Encoder[String] = Encoders.STRING
  private implicit val intEnc: Encoder[Int] = Encoders.scalaInt

  /** A5 streaming keep-first: emit each key's first-ever record, swallow
    * the rest. `ttlMs` > 0 arms a processing-time timeout that clears the
    * key's marker (W7 state TTL — the reference sets 1-day TTL on its
    * order-detail dedup state). */
  def keepFirst[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
                                        ttlMs: Long = 0L): Dataset[V] = {
    // Arm the timeout machinery only when a TTL is requested: a configured
    // ProcessingTimeTimeout makes the engine schedule continuous timer
    // batches even with no data, which burns cycles on an idle stream.
    val timeoutConf =
      if (ttlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf) {
      (_: K, it: Iterator[V], state: GroupState[Boolean]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else if (state.exists) {
          // every invocation clears the key's pending timer — re-arm, or
          // the marker would never expire (idle-state-retention
          // semantics: TTL counts from the last event, W8)
          if (ttlMs > 0L) state.setTimeoutDuration(ttlMs)
          Iterator.empty
        } else {
          state.update(true)
          if (ttlMs > 0L) state.setTimeoutDuration(ttlMs)
          it.take(1)
        }
    }
  }

  /** A3 streaming per-period dedup (daily UV): emit a record when its
    * period differs from the key's last-seen period. State is ONE string
    * per key (the reference keeps `lastVisitDate` exactly so), not a set —
    * bounded regardless of stream length.
    *
    * `order` fixes the scan order WITHIN a micro-batch: Spark gives no
    * ordering guarantee for the group iterator (source order does not
    * survive the groupByKey shuffle), so the batch's rows are buffered and
    * sorted by it before the period scan — bounded by micro-batch size,
    * not stream length. ACROSS batches the period must be non-decreasing
    * per key (watermarked delivery), matching the reference's input. */
  def firstPerPeriod[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
                                             period: V => String,
                                             order: V => Long): Dataset[V] =
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: K, it: Iterator[V], state: GroupState[String]) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[V]
        var last = state.getOption.getOrElse("")
        it.toSeq.sortBy(order).foreach { v =>
          val p = period(v)
          if (p != last) { out += v; last = p }
        }
        if (last.nonEmpty) state.update(last)
        out.iterator
    }

  /** P6 streaming is_new repair: the flag is 1 only while the key's
    * first-seen period equals the record's period; later periods emit 0
    * (`DwdTrafficBaseLogSplit.java:70-97`). Emits (record, repairedFlag).
    * `order` fixes the intra-batch scan order (see [[firstPerPeriod]]) so
    * "first-seen" is well-defined when one batch spans periods. */
  def isNewRepair[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
      period: V => String, order: V => Long)(
      implicit e: Encoder[(V, Int)]): Dataset[(V, Int)] =
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: K, it: Iterator[V], state: GroupState[String]) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(V, Int)]
        var first = state.getOption.getOrElse("")
        it.toSeq.sortBy(order).foreach { v =>
          val p = period(v)
          if (first.isEmpty) first = p
          out += ((v, if (p == first) 1 else 0))
        }
        if (first.nonEmpty) state.update(first)
        out.iterator
    }

  /** A6/W9 streaming keep-last with EVENT-TIME timer flush: hold each
    * key's latest record; when the watermark passes the held record's
    * event time + `delayMs`, emit it once and clear state — the
    * reference's `registerEventTimeTimer` + `onTimer` emit
    * (`app/lab/DwsLeftJoinDuplication03Last.java:54-79`). Input must be
    * watermarked (`withWatermark`) for EventTimeTimeout to fire. */
  def keepLastEventTime[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
      tsMillis: V => Long, delayMs: Long): Dataset[V] =
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (_: K, it: Iterator[V], state: GroupState[V]) =>
        if (state.hasTimedOut) {
          val v = state.get; state.remove(); Iterator.single(v)
        } else {
          // explicit max-by event time — the group iterator's order is
          // NOT arrival order (it does not survive the shuffle), so
          // "latest" must be chosen by timestamp, not iterator position;
          // >= lets a same-ts row from a later batch supersede held state
          val last = it.foldLeft(state.getOption.getOrElse(null.asInstanceOf[V])) {
            (acc, v) => if (acc == null || tsMillis(v) >= tsMillis(acc)) v else acc
          }
          state.update(last)
          // timer must sit strictly above the current watermark
          state.setTimeoutTimestamp(
            math.max(tsMillis(last) + delayMs, state.getCurrentWatermarkMs() + 1))
          Iterator.empty
        }
    }

  /** U7 streaming — per-key contribution cap: emit each key's first
    * `cap` records (by `order` within a batch, arrival order across
    * batches), swallow the rest. State is ONE counter per key — bounded
    * regardless of stream length; the batch twin is
    * [[graft.operators.DedupOps.capPerKey]]. Generalizes [[keepFirst]]
    * from 1 to n. */
  def capPerKey[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
                                        order: V => Long,
                                        cap: Int): Dataset[V] =
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: K, it: Iterator[V], state: GroupState[Int]) =>
        val seen = state.getOption.getOrElse(0)
        val sorted = it.toSeq.sortBy(order)
        val out = sorted.take(math.max(0, cap - seen))
        state.update(math.min(cap, seen + sorted.size)) // saturating counter
        out.iterator
    }

  /** J3/J8 streaming — temporal enrichment against keyed version state:
    * one unioned stream carries both dimension-version updates and facts;
    * each key's LATEST version lives in state, and every fact emits
    * paired with the version current at its arrival (None before any
    * version) — the keyed-state form of the reference's temporal join,
    * with Flink's `Temporal Table Function` semantics in arrival order.
    * Within a micro-batch `order` fixes the interleaving, so a version
    * preceding a fact in the same batch applies to it (the batch twin is
    * [[graft.operators.JoinOps.asofJoin]] when arrival order == event
    * order — asserted in `StatefulOpsSpec`). `ttlMs` > 0 expires idle
    * keys' version state (W8) — at 100 TB the dim keyspace must not
    * accumulate unboundedly. */
  def temporalEnrich[K: Encoder, T: Encoder](ds: Dataset[T], key: T => K,
      order: T => Long, isVersion: T => Boolean, ttlMs: Long = 0L)(
      implicit e: Encoder[(T, Option[T])]): Dataset[(T, Option[T])] =
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(),
      if (ttlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()) {
      (_: K, it: Iterator[T], state: GroupState[T]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[(T, Option[T])]
          it.toSeq.sortBy(order).foreach { t =>
            if (isVersion(t)) state.update(t)
            else out += ((t, state.getOption))
          }
          if (ttlMs > 0L && state.exists) state.setTimeoutDuration(ttlMs)
          out.iterator
        }
    }

  /** A6/K3 streaming keep-last: every micro-batch emits each touched key's
    * latest record — the changelog-tail semantics of an upsert sink.
    * Downstream `foreachBatch` + [[graft.sinks.Sinks.upsertKeyed]] gives
    * the reference's upsert-Kafka behavior (emit-on-update, last wins).
    * `seq` supplies the per-key total order "last" is judged by (the
    * group iterator's order is not arrival order — it does not survive
    * the shuffle). `ttlMs` > 0 expires idle keys (W8 idle-state
    * retention). */
  def keepLastUpdates[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
                                              seq: V => Long,
                                              ttlMs: Long = 0L): Dataset[V] =
    ds.groupByKey(key).mapGroupsWithState(
      if (ttlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()) {
      (_: K, it: Iterator[V], state: GroupState[V]) =>
        if (state.hasTimedOut) { val v = state.get; state.remove(); v }
        else {
          val last = it.foldLeft(state.getOption.getOrElse(null.asInstanceOf[V])) {
            (acc, v) => if (acc == null || seq(v) >= seq(acc)) v else acc
          }
          state.update(last)
          if (ttlMs > 0L) state.setTimeoutDuration(ttlMs)
          last
        }
    }

  /** A15 streaming windowed funnel: the per-key stage state machine run
    * incrementally — state is TWO numbers per key (stage reached,
    * anchor ms of the first stage-1 event), so a year-long stream holds
    * the same state a single batch would. Emits `(key, stage, tsMs)`
    * whenever a key ADVANCES a stage (append semantics: downstream
    * counts max stage per key, or diffs consecutive advances for
    * conversion latency). Within a micro-batch rows are sorted by
    * `orderOf` ((event-time µs, unique id) — the group iterator has no
    * order guarantee after the shuffle); ACROSS batches event-time must
    * be non-decreasing per key (watermarked delivery), the same
    * contract `firstPerPeriod` documents. Window arithmetic is in ms
    * (µs div 1000), bit-matching the batch a15 fold. */
  def funnelStage[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
                                          codeOf: V => Int,
                                          orderOf: V => (Long, Long),
                                          windowMs: Long): Dataset[(K, Int, Long)] = {
    implicit val outEnc: Encoder[(K, Int, Long)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaInt, Encoders.scalaLong)
    implicit val stEnc: Encoder[(Int, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (k: K, it: Iterator[V], state: GroupState[(Int, Long)]) =>
        var (stage, anchor) = state.getOption.getOrElse((0, 0L))
        val out = Seq.newBuilder[(K, Int, Long)]
        it.toSeq.sortBy(orderOf).foreach { v =>
          val c = codeOf(v)
          // floorDiv, not /: unix_millis floor-divides, and truncation
          // would disagree with the batch fold on pre-epoch timestamps
          val tMs = Math.floorDiv(orderOf(v)._1, 1000L)
          if (stage == 0 && c == 1) {
            stage = 1; anchor = tMs; out += ((k, 1, tMs))
          } else if (stage == 1 && c == 2 && tMs - anchor <= windowMs) {
            stage = 2; out += ((k, 2, tMs))
          } else if (stage == 2 && c == 3 && tMs - anchor <= windowMs) {
            stage = 3; out += ((k, 3, tMs))
          }
        }
        // never persist the (0, 0L) no-op: keys that haven't entered
        // the funnel must not accumulate state-store rows (NoTimeout ⇒
        // a stage-0 write would live forever; state stays O(funnel
        // participants), not O(keys ever seen))
        if (stage > 0) state.update((stage, anchor))
        out.result().iterator
    }
  }

  /** A19's streaming twin — per-key consecutive transition PAIRS emitted
    * incrementally: each arriving event pairs with its key's PREVIOUS
    * event type; downstream counts the pairs (`groupBy(prev, curr)`)
    * into the same matrix the batch lag-window produces. State is ONE
    * label per key (the last event type seen) — bytes per user, not
    * events — and, like the batch window, the pair relation spans any
    * gap, so there is nothing to expire: state is O(active keyspace) by
    * the problem's own definition (bound it upstream with u7-style caps
    * if the keyspace itself is unbounded). Delivery contract matches
    * [[funnelStage]]: within a micro-batch events sort by `orderOf`;
    * across batches per-key event-time must be non-decreasing (a
    * watermarked, key-partitioned source upholds this). */
  def transitionPairs[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
      typeOf: V => String,
      orderOf: V => (Long, Long)): Dataset[(K, String, String)] = {
    implicit val outEnc: Encoder[(K, String, String)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.STRING, Encoders.STRING)
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (k: K, it: Iterator[V], state: GroupState[String]) =>
        var prev = state.getOption.orNull
        val out = Seq.newBuilder[(K, String, String)]
        it.toSeq.sortBy(orderOf).foreach { v =>
          val t = typeOf(v)
          if (prev != null) out += ((k, prev, t))
          prev = t
        }
        if (prev != null) state.update(prev)
        out.result().iterator
    }
  }

  /** State of [[decayScore]]: total event count + parallel week/sum
    * arrays (the bucket map in encoder-friendly form). */
  case class DecayState(n: Long, weeks: Array[Long], sums: Array[Long])

  /** A26's streaming twin — per-key half-life decay score maintained
    * incrementally. State per key is the total event count plus a
    * bucket map (week index → non-negative fixed-point value sum).
    * a26 truncates per BUCKET, and arithmetic shifts compose
    * (`(x >> a) >> b == x >> (a+b)`), so stored buckets re-age to any
    * later reference with NO drift — the property the batch query chose
    * its algebra for. Buckets aged past 62 half-lives are dropped at
    * ingest: a non-negative long shifted by >= 63 is exactly 0 (this is
    * why the operator REQUIRES non-negative fixed-point values), so
    * state is <= 63 live buckets per key — bytes, regardless of history
    * length. Emits `(key, n_events, decayed_fp20 at refWeek)` per
    * touched key per micro-batch (append stream; readers take a key's
    * LAST emission — it subsumes the earlier ones). `refWeek` — the
    * reference the batch query derives from the data — is a parameter
    * here, exactly as the a26 scaladoc prescribes for production. */
  def decayScore[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
      fpOf: V => Long, weekOf: V => Long,
      refWeek: Long): Dataset[(K, Long, Long)] = {
    implicit val outEnc: Encoder[(K, Long, Long)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaLong,
        Encoders.scalaLong)
    implicit val stEnc: Encoder[DecayState] = Encoders.product[DecayState]
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (k: K, it: Iterator[V], state: GroupState[DecayState]) =>
        val st = state.getOption.getOrElse(
          DecayState(0L, Array.empty[Long], Array.empty[Long]))
        val m = scala.collection.mutable.HashMap.empty[Long, Long]
        st.weeks.indices.foreach(i => m(st.weeks(i)) = st.sums(i))
        var n = st.n
        it.foreach { v =>
          val w = weekOf(v); val fp = fpOf(v)
          require(fp >= 0L,
            s"decayScore requires non-negative fixed-point values (got $fp)")
          // an event PAST the reference week is undefined under this
          // algebra (a negative shift) — it is DROPPED, not thrown on:
          // an executor-side throw would poison the whole streaming
          // query on one bad record, where production semantics for
          // out-of-contract events are drop-and-move-on (pre-filter the
          // stream, or count drops upstream, if visibility is needed)
          if (w <= refWeek) {
            n += 1
            // a bucket already >= 63 half-lives old contributes exactly
            // 0 at refWeek and at every later reference — never stored
            if (refWeek - w <= 62) m(w) = m.getOrElse(w, 0L) + fp
          }
        }
        val weeks = m.keys.toArray.sorted
        state.update(DecayState(n, weeks, weeks.map(m)))
        val score = weeks.foldLeft(0L)((acc, w) =>
          acc + (m(w) >> (refWeek - w).toInt))
        Iterator.single((k, n, score))
    }
  }
}
