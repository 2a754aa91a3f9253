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

  /** Streaming token-id encoding against a FROZEN vocabulary — the
    * arrival-time twin of `TextOps.encodeTokens`. A vocabulary is model
    * state (built batch-side, versioned, broadcast); encoding against it
    * is stateless per document, so the streaming plan is a row-local
    * posexplode + broadcast join + per-doc re-aggregation with no
    * watermark state at all. Documents whose ids arrive in the same
    * micro-batch group locally; OOV maps to 0 as in the batch twin.
    *
    * The per-doc groupBy is keyed on (doc_id, ingest_ts): a streaming
    * aggregation without watermark would keep state forever, so callers
    * compose this AFTER [[cleanIngest]] (which watermarks ingest_ts) and
    * run it in append mode with the watermark flowing through.
    *
    * Unlike the batch twin (which left-joins the corpus back), empty
    * documents produce NO output row here — posexplode of an empty token
    * array yields nothing and there is no corpus relation to recover
    * them from in a stream.
    */
  def encodeStream(docs: DataFrame, vocabulary: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("ingest_ts"),
        org.apache.spark.sql.functions.posexplode(
          graft.text.TextOps.tokens(col("text"))).as(Seq("pos", "token")))
      .join(broadcast(vocabulary.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .groupBy(col("doc_id"), col("ingest_ts"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"),
        concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("pos"),
              coalesce(col("token_id"), lit(0L)).as("tid")))),
            s => s.getField("tid").cast("string"))).as("token_ids"))

  /** Streaming near-dup gate — the continuous twin of
    * [[graft.dedup.Dedup.incrementalNearDup]]: each arriving document's
    * minhash bands probe a STATIC corpus index
    * ([[graft.dedup.Dedup.minhashIndex]], in production a persisted
    * table appended per ingested batch), and documents whose signature
    * agreement with an indexed document reaches `threshold` are emitted
    * as (doc_id, ingest_ts, corpus_doc, est_jaccard) flags.
    *
    * Plan shape: signature + banding are stateless per-row projections,
    * the probe is a stream-static inner join (no streaming state), and
    * the only stateful operator is the pair-level
    * `dropDuplicatesWithinWatermark` — one (doc, corpus_doc) key per
    * flagged pair inside the horizon, so state tracks flag rate ×
    * watermark, not stream lifetime.
    */
  def nearDupGate(docs: DataFrame, corpusIndex: DataFrame,
                  watermark: String = "2 hours", numHashes: Int = 32,
                  bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val probe = graft.dedup.Dedup
      .minhashIndex(docs, numHashes = numHashes, bands = bands,
        carry = Seq("ingest_ts"))
      .withWatermark("ingest_ts", watermark)
    probe.as("n")
      .join(corpusIndex.as("c"),
        col("n.band") === col("c.band") && col("n.bh") === col("c.bh"))
      .select(col("n.doc_id").as("doc_id"), col("n.ingest_ts").as("ingest_ts"),
        col("c.doc_id").as("corpus_doc"),
        graft.dedup.Dedup.sigAgreement(
          col("n.signature"), col("c.signature"), numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicatesWithinWatermark("doc_id", "corpus_doc")
  }
}
