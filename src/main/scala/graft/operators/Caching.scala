package graft.operators

import org.apache.spark.sql.SparkSession

/** Scoped release for the library's cache contract.
  *
  * Self-join-shaped operators (`Dedup.minhashDedup`, `Ann.lshTopK`,
  * `Curation.curate`, …) persist a small shared intermediate because both
  * join sides reference it; results are lazy, so the operator cannot know
  * when the caller has consumed them. The raw contract — "call
  * `spark.catalog.clearCache()` after consuming each result" — is easy to
  * forget in a long-lived session. [[withCaches]] makes it structural:
  * consume everything inside the scope; the caches are released on the
  * way out, success or failure.
  *
  * Scope semantics: release is SESSION-WIDE (`catalog.clearCache()`), the
  * same call Bench/Verify make between queries — it drops every
  * DataFrame/table cache in the session, including ones created before
  * the scope. Don't wrap a scope around work whose caches you want to
  * keep warm; nest queries inside one scope per logical unit instead.
  * Results must be MATERIALIZED (collect/write/count) inside the scope —
  * a lazy DataFrame that escapes recomputes its operator's self-join
  * from scratch (correct, but the cache no longer helps).
  */
object Caching {

  def withCaches[A](spark: SparkSession)(body: => A): A =
    try body
    finally spark.catalog.clearCache()
}
