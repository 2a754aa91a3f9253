package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document-ingest gate — the continuous version of the batch
  * curation front door: exact dedup within the ingest horizon plus
  * decontamination against a static eval-set blocklist, the two filters a
  * training-corpus pipeline applies on arrival (the batch halves are
  * `Dedup.exactDedup` and `Dedup.contamination`).
  */
object DocStreams {

  /** Content-dedup + decontaminate a document stream.
    *
    * Input: a streaming DataFrame with (doc_id, text, ingest_ts …);
    * `evalDocs` is a STATIC relation of held-out eval documents.
    *
    *  - In-stream dedup keys on sha256(text) under
    *    `dropDuplicatesWithinWatermark`: state holds one 32-byte key per
    *    distinct document inside the horizon, so state size tracks
    *    ingest rate × watermark, not stream lifetime.
    *  - Decontamination is a stream-static LEFT ANTI join against the
    *    blocklist of eval content hashes. The static side is a few MB of
    *    digests at any realistic eval-suite size — Spark broadcasts it,
    *    so the gate adds zero shuffle to the streaming plan.
    *
    * Output carries `text_sha` so downstream sinks can key idempotent
    * writes on content identity.
    */
  def cleanIngest(docs: DataFrame, evalDocs: DataFrame,
                  watermark: String = "2 hours"): DataFrame = {
    val blocklist = evalDocs.select(sha2(col("text"), 256).as("text_sha")).distinct()
    docs
      .withColumn("text_sha", sha2(col("text"), 256))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("text_sha")
      .join(broadcast(blocklist), Seq("text_sha"), "left_anti")
  }
}
