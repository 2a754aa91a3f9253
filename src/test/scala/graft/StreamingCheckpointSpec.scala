package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables

/** Fault-tolerance: a file-source streaming query with a checkpoint stops
  * mid-stream and restarts; the parquet sink must contain every input row
  * exactly once (offsets replayed from the checkpoint, no loss, no dupes).
  */
class StreamingCheckpointSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("checkpointed file stream restarts exactly-once") {
    val src = java.nio.file.Files.createTempDirectory("graft_src").toString
    val out = java.nio.file.Files.createTempDirectory("graft_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_chk").toString

    val events = Tables.events(spark, sfDir).cache()
    val batch1 = events.filter($"event_id" < 500)
    val batch2 = events.filter($"event_id" >= 500 && $"event_id" < 800)
    batch1.coalesce(1).write.mode("append").parquet(src)

    def run(): Unit = {
      val stream = spark.readStream.schema(events.schema).parquet(src)
      val q = stream.select("event_id", "ts", "user_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    run() // first incarnation consumes batch1
    batch2.coalesce(1).write.mode("append").parquet(src)
    run() // restarted incarnation must pick up exactly batch2

    val sunk = spark.read.parquet(out)
    assert(sunk.count() === batch1.count() + batch2.count())
    assert(sunk.select("event_id").distinct().count() === sunk.count(),
      "duplicate rows would mean offsets were replayed without dedup")
    events.unpersist()
  }
}
