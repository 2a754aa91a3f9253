package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.streaming.DocStreams

/** Streaming ingest gate (dedup + decontamination) vs its batch twin. */
class DocStreamSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("cleanIngest drops in-stream duplicates and eval-set content") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        // synthetic arrival time: one doc per second
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ingest_ts"))
    val eval = Tables.documents(spark, sfDir).filter($"doc_id" % 50 === 0)
    // at-least-once upstream: the whole feed delivered twice
    val feed = docs.union(docs)

    val src = java.nio.file.Files.createTempDirectory("graft_ds_src").toString
    feed.coalesce(1).write.mode("append").parquet(src)
    val out = java.nio.file.Files.createTempDirectory("graft_ds_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_ds_chk").toString

    val q = DocStreams.cleanIngest(
        spark.readStream.schema(feed.schema).parquet(src), eval)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable() finally q.stop()
    val sunk = spark.read.parquet(out)

    // batch twin: distinct content minus eval content
    val evalShas = eval.select(sha2($"text", 256).as("s"))
    val want = docs.select(sha2($"text", 256).as("s")).distinct()
      .join(evalShas, Seq("s"), "left_anti")

    assert(sunk.count() === want.count())
    assert(sunk.select("text_sha").distinct().count() === sunk.count(),
      "one row per distinct content")
    // nothing from the blocklist leaked through
    assert(sunk.join(evalShas.withColumnRenamed("s", "text_sha"),
      Seq("text_sha")).count() === 0)
    // and the gate actually removed something on this fixture
    assert(want.count() < docs.count())
  }

  test("encodeStream matches the batch encoder on the gated stream") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ingest_ts"))
    val vocab = graft.text.TextOps.vocab(Tables.documents(spark, sfDir), maxSize = 16)

    val src = java.nio.file.Files.createTempDirectory("graft_de_src").toString
    docs.coalesce(1).write.mode("append").parquet(src)
    val out = java.nio.file.Files.createTempDirectory("graft_de_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_de_chk").toString

    // watermarked directly (composing cleanIngest would drop content dups
    // and make the survivor set order-dependent — not what this test pins)
    val gated = spark.readStream.schema(docs.schema).parquet(src)
      .withWatermark("ingest_ts", "2 hours")
    val q = DocStreams.encodeStream(gated, vocab)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()
    try {
      q.processAllAvailable()
      // append mode holds groups until the watermark passes them: push it
      // with a far-future sentinel row in a second micro-batch
      docs.limit(1)
        .select(lit(-1L).as("doc_id"), lit("sentinel").as("text"),
          timestamp_seconds(lit(1700000000L + 30L * 24 * 3600)).as("ingest_ts"))
        .coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .filter(col("doc_id") >= 0) // the sentinel itself may or may not flush
      .select("doc_id", "token_ids").as[(Long, String)].collect().toMap

    val batch = graft.text.TextOps.encodeTokens(Tables.documents(spark, sfDir), vocab)
      .filter(col("n_tokens") > 0) // empty docs emit no streaming row
      .select("doc_id", "token_ids").as[(Long, String)].collect().toMap
    assert(streamed === batch)
    assert(batch.nonEmpty)
    spark.catalog.clearCache()
  }

  test("nearDupGate matches batch incrementalNearDup, including under redelivery") {
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter($"doc_id" % 5 =!= 0)
    val batchDocs = all.filter($"doc_id" % 5 === 0)
      .select(col("doc_id"), col("text"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ingest_ts"))
    // the static index a production pipeline would persist as a table
    val index = graft.dedup.Dedup.minhashIndex(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    index.count()

    val src = java.nio.file.Files.createTempDirectory("graft_nd_src").toString
    // at-least-once upstream: the feed delivered twice
    batchDocs.union(batchDocs).coalesce(1).write.mode("append").parquet(src)
    val out = java.nio.file.Files.createTempDirectory("graft_nd_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_nd_chk").toString

    val q = DocStreams.nearDupGate(
        spark.readStream.schema(batchDocs.schema).parquet(src), index)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "corpus_doc", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet

    val batch = graft.dedup.Dedup.incrementalNearDup(corpus, batchDocs)
      .select(col("batch_doc"), col("corpus_doc"), col("est_jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture should contain cross-split near-dups")
    spark.catalog.clearCache()
  }
}
