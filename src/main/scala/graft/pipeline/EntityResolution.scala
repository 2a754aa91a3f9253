package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** Fellegi–Sunter field match weights (Fellegi & Sunter, JASA 1969;
    * the scoring model behind Splink-style probabilistic linkage): for
    * each comparison field (type, size, retail price), m = P(agree | match) estimated from the
    * deterministic seed matches (the fuzzy name pairs [[resolveParts]]
    * clusters on), u = P(agree | random pair) computed EXACTLY from the
    * field's value histogram as Σ c_v(c_v−1) / n(n−1) — no non-match
    * pair sampling — and the log₂(m/u) agreement weight a linkage run
    * adds to a pair's score when the field agrees.
    *
    * Exactness: m and u stay exact ratios of longs; the weight is ONE
    * final log₂ of the exact cross-ratio (agree·u_den)/(n_pairs·u_num),
    * milli-quantized ([[graft.analytics.Metrics]] mutualInfo
    * discipline). Fields with zero agreement or a degenerate histogram
    * emit NULL weight rather than −∞.
    *
    * Scale shape: the seed-pair relation is the blocked fuzzy join
    * (never all-pairs); BOTH the pair-agreement counts and the value
    * histograms melt their fields through one explode so each side is
    * ONE shuffle regardless of field count; u needs no pairs at all.
    *
    * Output: one row per field (field, n_match_pairs, n_agree, u_num,
    * u_den, weight_milli).
    */
  def fsWeights(part: DataFrame, maxDist: Int = 2): DataFrame = {
    val fields = Seq("p_type", "p_size", "p_retailprice")
    val attrs = part.select(col("p_partkey") +: fields.map(f =>
      col(f).cast("string").as(f)): _*)
    val pairs = Breadth3.fuzzyNamePairs(part, maxDist)
      .select(col("key_a"), col("key_b"))
      .join(attrs.select(col("p_partkey").as("key_a") +:
        fields.map(f => col(f).as(s"a_$f")): _*), "key_a")
      .join(attrs.select(col("p_partkey").as("key_b") +:
        fields.map(f => col(f).as(s"b_$f")): _*), "key_b")
    // melt pair agreements: one explode, one shuffle for all fields
    val mAgg = pairs.select(explode(array(fields.map(f =>
        struct(lit(f).as("field"),
          when(col(s"a_$f") === col(s"b_$f"), 1L).otherwise(0L)
            .as("agree"))): _*)).as("m"))
      .select("m.*")
      .groupBy("field")
      .agg(count(lit(1)).as("n_match_pairs"), sum(col("agree")).as("n_agree"))
    // melt value histograms: u_num = Σ c_v(c_v−1) per field
    val uAgg = attrs.select(explode(array(fields.map(f =>
        struct(lit(f).as("field"), col(f).as("v"))): _*)).as("m"))
      .select("m.*")
      .groupBy("field", "v").agg(count(lit(1)).as("c"))
      .groupBy("field").agg(sum(col("c") * (col("c") - 1)).as("u_num"))
    val tot = part.agg((count(lit(1)) * (count(lit(1)) - 1)).as("u_den"))
    mAgg.join(uAgg, "field").crossJoin(broadcast(tot))
      .select(col("field"), col("n_match_pairs"), col("n_agree"),
        col("u_num"), col("u_den"),
        when(col("n_agree") === 0 || col("u_num") === 0,
          lit(null).cast("long"))
          .otherwise(floor(log2(
            (col("n_agree").cast(DecimalType(38, 0)) * col("u_den"))
              .cast("double") /
              (col("n_match_pairs").cast(DecimalType(38, 0)) * col("u_num"))
                .cast("double")) * 1e3 + 0.5).cast("long"))
          .as("weight_milli"))
  }

  /** DuckDB replay of [[fsWeights]] — same seed-pair join (the
    * q_fuzzy_pairs oracle), same exact ratios, same single log₂.
    */
  def fsWeightsOracleSql(maxDist: Int = 2): String = {
    val fields = Seq("p_type", "p_size", "p_retailprice")
    val mRows = fields.map { f =>
      s"""SELECT '$f' AS field, COUNT(*) AS n_match_pairs,
         |       SUM(CASE WHEN a.$f::VARCHAR = b.$f::VARCHAR
         |                THEN 1 ELSE 0 END) AS n_agree
         |FROM fpairs JOIN part a ON a.p_partkey = key_a
         |            JOIN part b ON b.p_partkey = key_b""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val uRows = fields.map { f =>
      s"""SELECT '$f' AS field, SUM(c * (c - 1)) AS u_num
         |FROM (SELECT COUNT(*) AS c FROM part GROUP BY $f::VARCHAR)"""
        .stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH fpairs AS (
       |  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b
       |  FROM part a JOIN part b
       |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
       |  WHERE levenshtein(a.p_name, b.p_name) <= $maxDist),
       |magg AS (
       |  $mRows),
       |uagg AS (
       |  $uRows),
       |tot AS (SELECT COUNT(*) * (COUNT(*) - 1) AS u_den FROM part)
       |SELECT field, CAST(n_match_pairs AS BIGINT) AS n_match_pairs,
       |       CAST(n_agree AS BIGINT) AS n_agree,
       |       CAST(u_num AS BIGINT) AS u_num, CAST(u_den AS BIGINT) AS u_den,
       |       CASE WHEN n_agree = 0 OR u_num = 0 THEN NULL
       |            ELSE CAST(FLOOR(log2(
       |                   CAST(CAST(n_agree AS HUGEINT) * u_den AS DOUBLE)
       |                   / CAST(CAST(n_match_pairs AS HUGEINT) * u_num
       |                          AS DOUBLE)) * 1e3 + 0.5) AS BIGINT) END
       |         AS weight_milli
       |FROM magg JOIN uagg USING (field) CROSS JOIN tot""".stripMargin
  }
}
