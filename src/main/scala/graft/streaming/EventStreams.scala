package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface over the `events` stream-shaped table.
  *
  * The reference has no streaming (SURVEY.md §2.1 — Airflow's @daily
  * schedule is batch re-execution), but the north star asks for
  * stream-capable event processing. Each transform here is plan-identical
  * between `read` and `readStream` inputs — the batch twins in
  * `analytics.Breadth` (eventsHourly / eventSessions) are what the DuckDB
  * oracle checks, and these incremental versions run the same logic with
  * watermarked state.
  *
  * Scale: windowed aggregations shuffle by (window, key) with partial
  * aggregation; per-user state in [[runningUserCounts]] lives in the state
  * store partition that owns the user — nothing accumulates on the driver.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Hourly tumbling-window rollup per event type — streaming twin of
    * `Breadth.eventsHourly`. Late data beyond `watermark` is dropped and
    * the window state is reclaimed.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding 1h/30min windows — streaming twin of
    * `Breadth3.slidingEventCounts`: identical grouping expression, plus a
    * watermark so state for windows older than `watermark` is evicted.
    * Each event updates two open windows; state size is bounded by
    * (watermark span / slide) × |event types|.
    */
  def slidingRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** The broadcast side of [[driftGate]]: the 1-row reference histogram
    * (r0..r{buckets−1}) over a STATIC corpus — built once from the
    * trusted baseline, joined onto every streaming window.
    */
  def referenceHistogram(events: DataFrame, buckets: Int = 20,
                         vmax: Double = 500.0): DataFrame = {
    val rs = graft.analytics.Drift.histAggs(buckets, "r")
    events.select(graft.analytics.Drift.bucketCol(col("value"), buckets, vmax).as("b"))
      .groupBy().agg(rs.head, rs.tail: _*)
  }

  /** Streaming distribution-drift gate — the online twin of
    * `Drift.hourlyValueDrift`: per event-time tumbling window, the EXACT
    * integer Wasserstein-1 distance (bucket-width units,
    * micro-quantized) between the window's binned `value` histogram and
    * a static reference histogram, with a `drifted` flag once the
    * distance crosses `thresholdMicro`. The ingest monitor that flags a
    * bad upstream batch BEFORE it lands in the corpus.
    *
    * Streaming-legal by construction: the histogram is ONE windowed
    * aggregation (a fixed count column per bucket — no chained agg, no
    * window function), the reference joins on as a stream-static
    * broadcast equi-join, and the cumulative/W1 pass is a fixed
    * expression over the bounded bucket count. State per open window is
    * `buckets` longs; the watermark evicts closed windows.
    */
  def driftGate(events: DataFrame, reference: DataFrame, buckets: Int = 20,
                vmax: Double = 500.0, watermark: String = "2 hours",
                windowDur: String = "1 hour",
                thresholdMicro: Long = 300000L): DataFrame = {
    val cs = graft.analytics.Drift.histAggs(buckets, "c")
    val wh = events
      .withWatermark("ts", watermark)
      .select(col("ts"),
        graft.analytics.Drift.bucketCol(col("value"), buckets, vmax).as("b"))
      .groupBy(window(col("ts"), windowDur))
      .agg(cs.head, cs.tail: _*)
      .select(col("window.start").as("window_start") +:
        (0 until buckets).map(i => col(s"c$i")): _*)
    wh.withColumn("__k", lit(1))
      .join(broadcast(reference.withColumn("__k", lit(1))), "__k")
      .select(graft.analytics.Drift.w1Select(buckets): _*)
      .select(graft.analytics.Drift.w1Finish(thresholdMicro): _*)
  }

  /** Session windows (30-minute inactivity gap) per user via the built-in
    * `session_window` — streaming twin of `Breadth.eventSessions`' grain.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("session"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("user_id"), col("session.start").as("session_start"),
        col("session.end").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming ingest dedup: first occurrence of each event_id within the
    * watermark horizon passes; replays and at-least-once upstream dupes
    * are dropped. State is one key per event inside the horizon — the
    * watermark bounds it, so state size tracks ingest rate × horizon,
    * not stream lifetime. This is the streaming half of the exact-dedup
    * story (`Dedup.exactDedup` is the batch half).
    */
  def dedupedStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: each purchase attributed to a prior click
    * by the same user within `horizon`. Both inputs are watermarked and
    * the join predicate bounds event time in BOTH directions — exactly
    * what Spark needs to expire buffered rows instead of holding join
    * state forever. State per side ≈ rate × (watermark + horizon).
    */
  def clickPurchaseAttribution(events: DataFrame, watermark: String = "2 hours",
                               horizon: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("click_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select("purchase_id", "user_id", "purchase_ts", "value", "click_id", "click_ts")
  }

  /** The idempotent write inside [[idempotentParquetSink]]: each micro-batch
    * lands in its own `batch_id=N` directory with overwrite semantics, so a
    * replayed batch (failure between sink write and checkpoint commit)
    * rewrites the same directory byte-for-byte instead of appending
    * duplicates. Readers see the union via partition discovery on
    * `batch_id`. This is the exactly-once contract Structured Streaming
    * asks of a sink: (batchId, data) is deterministic on replay, so an
    * idempotent write keyed by batchId closes the loop.
    */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, outDir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** foreachBatch parquet sink with exactly-once semantics via
    * batch-id-keyed overwrite. `foreachBatch` is the escape hatch for
    * sinks Spark doesn't ship (JDBC upserts, multi-table fanout) — this
    * instance shows the idempotence pattern those sinks must follow.
    */
  def idempotentParquetSink(events: DataFrame, outDir: String,
                            checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeBatchIdempotent(b.toDF(), id, outDir))
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming twin of `Breadth3.ohlcBars`: OHLC per (15-min window,
    * event type) as an incremental windowed aggregation. The batch
    * version selects open/close with row_number windows — those don't
    * exist in streaming, so here open/close are `min_by`/`max_by` with a
    * (ts, event_id) STRUCT ordering key, the same total order the batch
    * tie-break uses; both reduce with partial aggregation, and watermark
    * eviction bounds state to open windows.
    */
  def ohlcStream(events: DataFrame, minutes: Int = 15,
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$minutes minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("volume"))
      .select(col("window.start").as("bar_start"), col("event_type"),
        col("n_events"), col("open"), col("high"), col("low"), col("close"),
        col("volume"))

  case class OpenSession(start: Long, last: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /** Full streaming sessionizer via `flatMapGroupsWithState` with
    * EVENT-TIME TIMEOUTS — the custom-state escape hatch where
    * `session_window` doesn't fit (emit-on-close semantics, per-session
    * payload). A user's trailing session stays open in the state store
    * with a timeout at (last event + gap); when the watermark passes it,
    * the timed-out callback emits the closed session and frees the
    * state — so state size tracks ACTIVE users only, and output is
    * append-mode (each session exactly once, on close).
    *
    * Within a micro-batch, events are sorted and split on the gap
    * locally (groups are per-user, so the sort is per-user-batch-sized);
    * all but the trailing session close immediately. A batch whose
    * events merge with the open state extends it; otherwise the open
    * session closes first. If the timeout target is already behind the
    * watermark the session closes inline (setTimeoutTimestamp rejects
    * past timestamps).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 watermark: String = "2 hours"): Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.OutputMode
    val gapMs = gapMinutes * 60000L
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, ts(s.start), ts(s.last), s.n))
          } else {
            val newEvents = it.map(e => e.ts.getTime).toArray.sorted
            // seed with the open session if the first new event extends it;
            // otherwise the open session closes now
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open: Option[OpenSession] = state.getOption
            newEvents.foreach { t =>
              open match {
                case Some(s) if t - s.last <= gapMs =>
                  open = Some(OpenSession(s.start, math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(uid, ts(s.start), ts(s.last), s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open match {
              case Some(s) if s.last + gapMs > state.getCurrentWatermarkMs() =>
                state.update(s)
                state.setTimeoutTimestamp(s.last + gapMs)
              case Some(s) => // already expired relative to the watermark
                closed += ClosedSession(uid, ts(s.start), ts(s.last), s.n)
                state.remove()
              case None => ()
            }
            closed.iterator
          }
      }
  }

  // ---------------------------------------------------------- as-of twin

  case class AsOfLeftRow(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
  case class AsOfRightRow(key: Long, rts: java.sql.Timestamp,
                          o_orderkey: Long, o_totalprice: Double)
  case class AsOfUnionRow(key: Long, ts: java.sql.Timestamp, side: Int,
                          event_id: Long, o_orderkey: Long, o_totalprice: Double)
  case class AsOfBuf(rTs: Array[Long], rKey: Array[Long], rVal: Array[Double],
                     lTs: Array[Long], lId: Array[Long])
  case class AsOfMatched(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                         o_orderkey: Option[Long],
                         o_orderdate: Option[java.sql.Timestamp],
                         o_totalprice: Option[Double])

  /** Streaming twin of [[graft.operators.AsOfJoin.asOf]] (the
    * `q_asof_join` batch query): each left event is matched to the
    * latest right row with the same key at-or-before its event time.
    *
    * Spark's stream-stream joins need BOTH-SIDED time bounds to expire
    * state, but backward as-of has an unbounded lookback — so this is
    * `flatMapGroupsWithState` with event-time timeouts instead. Both
    * inputs union into one keyed, watermarked stream; per-key state
    * holds (a) buffered lefts newer than the watermark, and (b) rights
    * newer than the watermark PLUS the single latest right at-or-below
    * it — everything an as-of match for any future-arriving left could
    * need, and nothing more. When the watermark passes a left's
    * timestamp, no earlier right can arrive, so the match is final:
    * emitted exactly once (append mode) and freed. State per key is
    * O(rate × watermark) + 1 retained right — the irreducible as-of
    * memory (the "latest right" must survive idle periods; put a TTL on
    * it only if your domain allows forgetting).
    *
    * Same precondition as the batch operator: rights unique per
    * (key, ts) — pre-deduplicate with `AsOfJoin.latestPerKeyTs`.
    */
  def asOfStream(lefts: Dataset[AsOfLeftRow], rights: Dataset[AsOfRightRow],
                 watermark: String = "2 hours"): Dataset[AsOfMatched] = {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val unionEnc = Encoders.product[AsOfUnionRow]
    implicit val bufEnc = Encoders.product[AsOfBuf]
    implicit val outEnc = Encoders.product[AsOfMatched]
    // state keeps event time in MICROS (Spark's timestamp precision) — a
    // millis round-trip would corrupt sub-millisecond event timestamps
    val toMicros = (t: java.sql.Timestamp) => t.getTime / 1000 * 1000000 + t.getNanos / 1000
    val ts = (us: Long) => {
      val t = new java.sql.Timestamp(us / 1000000 * 1000)
      t.setNanos((us % 1000000).toInt * 1000)
      t
    }

    val taggedL = lefts.map(l => AsOfUnionRow(l.user_id, l.ts, 1, l.event_id, 0L, 0.0))
    val taggedR = rights.map(r => AsOfUnionRow(r.key, r.rts, 0, 0L, r.o_orderkey, r.o_totalprice))

    taggedL.unionByName(taggedR)
      .withWatermark("ts", watermark)
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[AsOfBuf, AsOfMatched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[AsOfUnionRow], state: GroupState[AsOfBuf]) =>
          val prev = state.getOption.getOrElse(
            AsOfBuf(Array.empty, Array.empty, Array.empty, Array.empty, Array.empty))
          val rBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          prev.rTs.indices.foreach(i => rBuf += ((prev.rTs(i), prev.rKey(i), prev.rVal(i))))
          val lBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          prev.lTs.indices.foreach(i => lBuf += ((prev.lTs(i), prev.lId(i))))
          it.foreach { r =>
            if (r.side == 0) rBuf += ((toMicros(r.ts), r.o_orderkey, r.o_totalprice))
            else lBuf += ((toMicros(r.ts), r.event_id))
          }
          val rSorted = rBuf.sortBy(_._1).toArray
          val wm = state.getCurrentWatermarkMs() * 1000 // millis → micros

          // lefts older than the watermark are final: no earlier right can arrive
          val (done, pending) = lBuf.partition(_._1 < wm)
          val out = done.sortBy(l => (l._1, l._2)).map { case (lts, lid) =>
            // greatest right ts <= left ts (exact matches included)
            var lo = 0; var hi = rSorted.length - 1; var best = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (rSorted(mid)._1 <= lts) { best = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (best < 0) AsOfMatched(lid, key, ts(lts), None, None, None)
            else AsOfMatched(lid, key, ts(lts), Some(rSorted(best)._2),
              Some(ts(rSorted(best)._1)), Some(rSorted(best)._3))
          }

          // prune rights: keep those at/after the watermark + the single
          // latest one strictly before it
          val keepFrom = {
            val firstAtWm = rSorted.indexWhere(_._1 >= wm)
            val boundary = if (firstAtWm < 0) rSorted.length else firstAtWm
            math.max(boundary - 1, 0)
          }
          val rKept = rSorted.drop(keepFrom)

          if (rKept.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(AsOfBuf(rKept.map(_._1), rKept.map(_._2), rKept.map(_._3),
              pending.map(_._1).toArray, pending.map(_._2).toArray))
            if (pending.nonEmpty) // timeout API takes millis; round up past wm
              state.setTimeoutTimestamp(math.max(pending.map(_._1).min, wm) / 1000 + 1)
          }
          out.iterator
      }
  }

  /** Arbitrary stateful processing: per-user running totals via
    * `mapGroupsWithState` — the escape hatch for stateful logic windows
    * can't express. Update-mode output, one row per user per trigger.
    */
  def runningUserCounts(events: Dataset[Event]): Dataset[UserRunning] = {
    implicit val stateEnc = Encoders.product[UserRunning]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var v = prev.total_value
          it.foreach { e => n += 1; v += e.value }
          val next = UserRunning(uid, n, v)
          state.update(next)
          next
      }
  }
}
