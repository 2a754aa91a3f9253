package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.streaming.EventStreams

/** Streaming dedup and stream-stream join, each checked against the
  * equivalent batch computation on the same data.
  */
class StreamJoinDedupSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def fileStream(df: org.apache.spark.sql.DataFrame) = {
    val src = java.nio.file.Files.createTempDirectory("graft_ss_src").toString
    df.coalesce(1).write.mode("append").parquet(src)
    spark.readStream.schema(df.schema).parquet(src)
  }

  test("dropDuplicatesWithinWatermark drops replayed event_ids") {
    val base = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .filter($"event_id" < 400)
    // at-least-once upstream: every row delivered twice
    val doubled = base.union(base)
    val out = java.nio.file.Files.createTempDirectory("graft_ss_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_ss_chk").toString
    val q = EventStreams.dedupedStream(fileStream(doubled))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable() finally q.stop()
    val sunk = spark.read.parquet(out)
    assert(sunk.count() === base.count())
    assert(sunk.select("event_id").distinct().count() === base.count())
  }

  test("stream-stream click->purchase join matches the batch join") {
    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .filter($"user_id" < 40)
    val out = java.nio.file.Files.createTempDirectory("graft_sj_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_sj_chk").toString
    val q = EventStreams.clickPurchaseAttribution(fileStream(events))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet

    // batch twin: same predicate on static frames
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("cu"), $"ts".as("cts"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("pu"), $"ts".as("pts"))
    val batch = purchases.join(clicks,
        $"cu" === $"pu" && $"cts" <= $"pts" &&
          $"cts" >= $"pts" - expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet

    assert(batch.nonEmpty, "fixture must produce at least one attribution")
    assert(streamed === batch)
  }
}
