package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Leakage-safe train/val/test assignment.
  *
  * A per-DOCUMENT hash split leaks: near-duplicate documents (template
  * pages, re-crawls, boilerplate variants) land in different splits, so
  * the eval set contains soft copies of training rows and every metric
  * is optimistically biased — the standard contamination failure mode a
  * training-data pipeline must close (same concern as
  * [[Dedup.contamination]], but at split-assignment time rather than
  * audit time).
  *
  * The fix: assign by near-dup CLUSTER, not by document. Minhash-LSH
  * pairs → min-label connected components give each document a cluster
  * id (singletons are their own cluster); the split bucket is a
  * deterministic md5 hash of the cluster id, so every member of a
  * cluster — including transitive A≈B≈C chains — shares one split, runs
  * are reproducible without any stored state, and adding documents never
  * reassigns an existing cluster (the hash depends only on the cluster's
  * min-member id).
  *
  * 100 TB shape: the only new work over the dedup pass itself is one
  * left join of the corpus against the (pairs-sized) cluster relation
  * and a per-row hash — the split adds nothing heavier than the dedup
  * the pipeline already runs.
  */
object Splits {

  /** Per-document split assignment: (doc_id, cluster_id, split) with
    * `split ∈ {train, val, test}` by md5(cluster) percent bucket.
    */
  def leakageSafeSplit(documents: DataFrame,
                       trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      "need three non-empty buckets: 0 < trainPct, 0 < valPct, train+val < 100")
    val clusters = Dedup.dupClusters(Dedup.minhashDedup(documents))
    documents.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      // md5Base60 is non-negative (60-bit), so % 100 matches DuckDB's %
      .withColumn("bucket",
        Dedup.md5Base60(concat(lit("split:"), col("cluster_id").cast("string"))) % 100)
      .select(col("doc_id"), col("cluster_id"),
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test").as("split"))
  }
}
