package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.Sampling
import graft.text.TextOps

/** End-to-end training-data curation: the composite pipeline the
  * individual operators exist for, in the canonical order —
  *
  *   1. quality filter   (cheap, no shuffle — shrink first)
  *   2. exact dedup      (hash group-by — removes the bulk)
  *   3. near-dup removal (MinHash-LSH pairs → drop the higher doc_id of
  *                        each surviving pair)
  *   4. per-source deterministic sampling (reproducible splits)
  *
  * Order matters at 100 TB: each stage strictly shrinks the data the next
  * (more expensive) stage sees, and exact-dedup-before-minhash is what
  * keeps degenerate LSH buckets (billions of identical docs) from ever
  * forming (SCALE.md).
  *
  * CACHING CONTRACT: persists the post-exact-dedup corpus (and MinHash
  * persists its band relation); the caller releases caches after consuming
  * the result — see the full note on [[graft.dedup.Dedup]].
  */
object Curation {

  /** Returns the curated corpus:
    * (doc_id, text, source, n_chars, quality_score).
    *
    * `langAllow` (optional) inserts a language gate before the quality
    * filter — n-gram language ID is another cheap no-shuffle projection,
    * so it belongs in the shrink-first prefix of the pipeline. Empty =
    * no language filtering (the oracle-checked configuration).
    */
  def curate(documents: DataFrame,
             minQuality: Double = 0.2,
             nearDupThreshold: Double = 0.7,
             samplePerSource: Int = 1000000,
             langAllow: Seq[String] = Nil): DataFrame = {
    // 0. optional language gate
    val base =
      if (langAllow.isEmpty) documents
      else documents.join(
        TextOps.langId(documents)
          .filter(col("lang_pred").isin(langAllow: _*)).select("doc_id"),
        "doc_id")

    // 1. quality gate (score carried through to the output)
    val scored = TextOps.quality(base)
      .filter(col("quality_score") >= minQuality)
      .select("doc_id", "quality_score")
    val quality = base.join(scored, "doc_id")

    // 2. exact dedup: keep the surviving (min) doc_id per content hash
    val keepExact = Dedup.exactDedup(quality).select("doc_id")
    // persisted: the minhash band self-join + anti-join below reference
    // this relation ~5×, and each reference would otherwise re-derive the
    // whole quality+dedup lineage (at cluster scale: a stage-boundary
    // write; locally: MEMORY_AND_DISK). Caller may clearCache() after.
    val exact = quality.join(keepExact, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. near-dup removal: minhash pairs vote out the larger doc_id
    val losers = Dedup.minhashDedup(exact, threshold = nearDupThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = exact.join(losers, Seq("doc_id"), "left_anti")

    // 4. reproducible per-source cap
    Sampling.hashSamplePerGroup(nearDeduped, "source", "doc_id", samplePerSource)
      .select("doc_id", "text", "source", "n_chars", "quality_score")
  }
}
