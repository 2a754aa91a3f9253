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
