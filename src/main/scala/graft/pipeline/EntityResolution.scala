package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.Breadth3
import graft.dedup.Dedup

/** Entity resolution (record linkage) over a dimension catalog: the
  * classic Fellegi–Sunter-shaped pipeline reduced to its deterministic
  * core — blocking, bounded pairwise comparison, transitive-closure
  * clustering, and one canonical record per resolved entity. The
  * reference warehouse carries exactly one row per film/customer because
  * Sakila is synthetic and clean; real ingested catalogs arrive with
  * near-duplicate rows (typos, re-ingests, vendor feeds), and this is
  * the operator that collapses them before the dimension load
  * (`etl.Dims`) runs.
  *
  * Composition of already-verified stages, nothing bespoke:
  *  1. candidate pairs — [[Breadth3.fuzzyNamePairs]]: brand-blocked,
  *     size-dispatched block join, length-band prefilter, threshold
  *     Levenshtein (edit distance ≤ maxDist);
  *  2. entity ids — [[Dedup.dupClusters]] min-label connected
  *     components over the match edges (driver union-find fast path,
  *     distributed fallback), so A≈B≈C chains resolve to ONE entity
  *     even when A and C never matched directly;
  *  3. canonical record — per entity: member count, the min-key
  *     member's name (unique key ⇒ fully deterministic), and the
  *     retailprice spread (min/max are order-independent, so doubles
  *     are exact here).
  *
  * Unmatched rows are their own single-member entities (left join +
  * coalesce), so the output is a complete deduplicated catalog, not
  * just the conflicted slice.
  *
  * 100 TB shape: the block join is the dispatched/salted one (never a
  * ≤|blocks|-task hash join), CC moves 8-byte node ids, and the final
  * rollup is a hash agg keyed by entity id. No stage touches more than
  * (pairs + catalog) rows.
  */
object EntityResolution {

  /** Resolve the part catalog into canonical entities.
    * Output: (entity_id, n_members, canonical_name, price_min, price_max).
    */
  def resolveParts(part: DataFrame, maxDist: Int = 2): DataFrame = {
    val pairs = Breadth3.fuzzyNamePairs(part, maxDist)
      .select(col("key_a").as("doc_a"), col("key_b").as("doc_b"))
    val clusters = Dedup.dupClusters(pairs)
    val members = part
      .select(col("p_partkey").cast("long").as("doc_id"),
        col("p_name"), col("p_retailprice"))
      .join(clusters, Seq("doc_id"), "left")
      .select(coalesce(col("cluster_id"), col("doc_id")).as("entity_id"),
        col("doc_id"), col("p_name"), col("p_retailprice"))
    members.groupBy("entity_id")
      .agg(
        count(lit(1)).as("n_members"),
        min_by(col("p_name"), col("doc_id")).as("canonical_name"),
        min(col("p_retailprice")).as("price_min"),
        max(col("p_retailprice")).as("price_max"))
  }
}
