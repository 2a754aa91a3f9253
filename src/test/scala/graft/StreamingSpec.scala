package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{count, lit, max, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Breadth, Breadth3}
import graft.io.Tables
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private lazy val eventRows: Seq[Event] =
    Tables.events(spark, sfDir).as[Event].collect().toSeq

  test("streaming hourly rollup converges to the batch twin") {
    val stream = MemoryStream[Event]
    stream.addData(eventRows)
    val q = EventStreams.hourlyRollup(stream.toDF())
      .writeStream.format("memory").queryName("hr").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hr")
      .select("window_start", "event_type", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    val batch = Breadth.eventsHourly(Tables.events(spark, sfDir))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("streaming sliding windows converge to the batch twin") {
    val stream = MemoryStream[Event]
    stream.addData(eventRows)
    val q = EventStreams.slidingRollup(stream.toDF())
      .writeStream.format("memory").queryName("slide").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("slide").collect().map(_.toSeq).toSet
    val batch = graft.analytics.Breadth3.slidingEventCounts(Tables.events(spark, sfDir))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("streaming drift gate converges to the batch twin") {
    val batchEvents = Tables.events(spark, sfDir)
    val reference = EventStreams.referenceHistogram(batchEvents)
    val stream = MemoryStream[Event]
    stream.addData(eventRows)
    val q = EventStreams.driftGate(stream.toDF(), reference)
      .writeStream.format("memory").queryName("drift").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("drift")
      .select("window_start", "n_window", "w1_micro", "drifted")
      .collect().map(_.toSeq).toSet
    val batch = graft.analytics.Drift.hourlyValueDrift(batchEvents)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("session windows produce per-user sessions") {
    val stream = MemoryStream[Event]
    stream.addData(eventRows)
    val q = EventStreams.sessionWindows(stream.toDF())
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sess")
    assert(got.count() > 0)
    assert(got.filter($"session_end" < $"session_start").count() === 0)
  }

  test("stream-static join: streaming events enriched with a static dim") {
    val stat = Tables.customer(spark, sfDir)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    val stream = MemoryStream[Event]
    stream.addData(eventRows.take(200))
    val joined = stream.toDF().join(stat, Seq("user_id"), "inner")
      .groupBy("c_mktsegment")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val q = joined.writeStream.format("memory").queryName("ss")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ss")
    assert(got.count() > 0)
    val streamedTotal = got.agg(org.apache.spark.sql.functions.sum("n"))
      .collect()(0).getLong(0)
    val batchTotal = eventRows.take(200).toDF()
      .join(stat, Seq("user_id"), "inner").count()
    assert(streamedTotal === batchTotal)
  }

  test("session_window agrees with the lag-based sessionizer on counts") {
    val batch = Tables.events(spark, sfDir)
    // batch-mode session_window: same grouping the streaming query uses
    val viaWindow = batch
      .groupBy(org.apache.spark.sql.functions.session_window($"ts", "30 minutes"),
        $"user_id")
      .count()
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    val viaLag = graft.analytics.Breadth.eventSessions(batch)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    assert(viaWindow === viaLag)
  }

  test("streaming OHLC bars converge to the batch bars") {
    val base = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .filter($"event_id" < 2000)
    val src = java.nio.file.Files.createTempDirectory("graft_oh_src").toString
    base.coalesce(1).write.mode("append").parquet(src)
    val out = java.nio.file.Files.createTempDirectory("graft_oh_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_oh_chk").toString
    val q = EventStreams.ohlcStream(
        spark.readStream.schema(base.schema).parquet(src))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()
    try {
      q.processAllAvailable()
      val maxTs = base.agg(max($"ts")).head().getTimestamp(0).getTime
      for (i <- 1 to 2) { // sentinel batches flush append-mode windows
        Seq((-1L * i, new java.sql.Timestamp(maxTs + i * 7L * 24 * 3600 * 1000),
          -1L, "sentinel", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(out).filter($"event_type" =!= "sentinel")
      .select("bar_start", "event_type", "n_events", "open", "high", "low", "close")
      .collect().map(_.toSeq).toSet
    val batch = Breadth3.ohlcBars(base)
      .select("bar_start", "event_type", "n_events", "open", "high", "low", "close")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("flatMapGroupsWithState sessionizer matches the batch lag sessionizer") {
    import graft.streaming.EventStreams.Event
    val base = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .filter($"user_id" < 25)
    val src = java.nio.file.Files.createTempDirectory("graft_fs_src").toString
    base.coalesce(1).write.mode("append").parquet(src)
    val out = java.nio.file.Files.createTempDirectory("graft_fs_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_fs_chk").toString

    val q = EventStreams.sessionize(
        spark.readStream.schema(base.schema).parquet(src).as[Event])
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()
    try {
      q.processAllAvailable()
      // two sentinel batches: the first advances the watermark, the second
      // gives the timed-out states a trigger to emit in
      val maxTs = base.agg(max($"ts")).head().getTimestamp(0).getTime
      for (i <- 1 to 2) {
        Seq((-1L * i, new java.sql.Timestamp(maxTs + i * 7L * 24 * 3600 * 1000),
          -1L, "sentinel", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(out).filter($"user_id" >= 0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    val batch = Breadth.eventSessions(base)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming as-of join matches the batch as-of join") {
    import graft.streaming.EventStreams.{AsOfLeftRow, AsOfRightRow}
    import graft.operators.AsOfJoin
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
      .filter($"user_id" < 25)
    val ord = AsOfJoin.latestPerKeyTs(
        Tables.orders(spark, sfDir)
          .select($"o_custkey", $"o_orderdate".cast("timestamp").as("o_orderdate"),
            $"o_orderkey", $"o_totalprice"),
        "o_custkey", "o_orderdate", "o_orderkey")
      .filter($"o_custkey" < 25)

    val srcL = java.nio.file.Files.createTempDirectory("graft_asof_l").toString
    val srcR = java.nio.file.Files.createTempDirectory("graft_asof_r").toString
    ev.coalesce(1).write.mode("append").parquet(srcL)
    ord.coalesce(1).write.mode("append").parquet(srcR)
    val out = java.nio.file.Files.createTempDirectory("graft_asof_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_asof_chk").toString

    val lefts = spark.readStream.schema(ev.schema).parquet(srcL).as[AsOfLeftRow]
    val rights = spark.readStream.schema(ord.schema).parquet(srcR)
      .select($"o_custkey".as("key"), $"o_orderdate".as("rts"),
        $"o_orderkey", $"o_totalprice")
      .as[AsOfRightRow]
    val q = graft.streaming.EventStreams.asOfStream(lefts, rights)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()
    try {
      q.processAllAvailable()
      // sentinel rights on an unused key advance the shared watermark so
      // pending lefts time out and emit (same flush pattern as the
      // sessionizer test above)
      val maxTs = ev.agg(max($"ts")).head().getTimestamp(0).getTime
      for (i <- 1 to 2) {
        Seq((-1L, new java.sql.Timestamp(maxTs + i * 7L * 24 * 3600 * 1000), -1L, 0.0))
          .toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
          .coalesce(1).write.mode("append").parquet(srcR)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(out)
      .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate", "o_totalprice")
      .collect().map(_.toSeq).toSet
    val batch = AsOfJoin.asOf(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_orderdate", "o_totalprice"))
      .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate", "o_totalprice")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("mapGroupsWithState accumulates across triggers") {
    val stream = MemoryStream[Event]
    val q = EventStreams.runningUserCounts(stream.toDS())
      .writeStream.format("memory").queryName("running").outputMode("update").start()
    val u = eventRows.head.user_id
    val mine = eventRows.filter(_.user_id == u)
    try {
      stream.addData(mine.take(3)); q.processAllAvailable()
      stream.addData(mine.slice(3, 5)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("running").filter($"user_id" === u)
      .select("n_events").as[Long].collect()
    assert(rows.max === math.min(5, mine.size).toLong)
  }
}
