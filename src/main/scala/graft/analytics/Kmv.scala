package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.dedup.Dedup

/** KMV (k-minimum-values) distinct sketch with theta-sketch set
  * operations (Bar-Yossef et al. RANDOM'02; Dasgupta et al., "Theta
  * sketch framework", 2016) — the second sketch family beside HLL
  * (`q_approx_distinct`/`q_hll_intersect`/`q_hyperanf`): HLL unions
  * cheaply but cannot intersect without inclusion–exclusion blowup;
  * KMV's sample-based sketch supports union AND intersection with
  * relative error O(1/√k), which is what audience-overlap questions
  * (users who did X and Y) actually need.
  *
  * Everything is md5-derived and integer-exact, so unlike the HLL
  * verdict queries the ESTIMATES themselves replay bit-identically in
  * the DuckDB oracle (the md5-HLL `q_hyperanf` convention): hashes are
  * `md5Base60` longs uniform on [0, 2⁶⁰); the estimator
  * (k−1)·2⁶⁰ ⁄ h₍ₖ₎ and the theta-intersection count ⁄ θ are computed
  * as DECIMAL(38,0) integral `div` (HUGEINT `//` in the oracle) in
  * micro units.
  *
  * Scale shape: one distinct-shuffle of (group, hash); per-group
  * k-smallest is a ranked-window filter Spark executes with
  * WindowGroupLimit (per-map-partition top-k BEFORE the exchange, so
  * the shuffle carries ≤ k rows per upstream partition, not the
  * distinct set); the union sketch is a TakeOrderedAndProject over 2k
  * rows; membership tests are broadcast semi-joins of a ≤ k-row
  * relation. Nothing driver-side, nothing all-pairs, no data-sized
  * window.
  */
object Kmv {

  /** 2⁶⁰ — the exclusive upper bound of the md5Base60 hash space. */
  val HashSpace: String = "1152921504606846976"

  /** Compare two keyed populations with one KMV sketch per side: the
    * input is a (grp, id) relation holding both sides tagged by group
    * name; exact counts (for the oracle's benefit and the caller's
    * calibration) sit beside the replayable sketch estimates.
    *
    * Output (one row): k, n_a, n_b, n_union, n_inter,
    * est_a_micro, est_b_micro, est_union_micro, est_inter_micro,
    * jaccard_est_micro — estimates in micro units (10⁶ = one user).
    * Sets smaller than k are represented exactly by their sketch
    * (θ = full space), per the standard KMV estimator.
    */
  def kmvCompare(items: DataFrame, typeA: String, typeB: String,
                 k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val two = items.filter(col("grp").isin(typeA, typeB))
      .select(col("grp"), col("id"))
    // one distinct shuffle feeds the sketches, the exact counts, and the
    // membership joins
    val hashed = graft.Caching.materialize(
      two.distinct().select(col("grp"),
        Dedup.md5Base60(col("id").cast("string")).as("h")))

    // per-group k smallest distinct hashes (md5 collisions between
    // distinct users collapse in BOTH engines identically)
    val w = Window.partitionBy("grp").orderBy(asc("h"))
    val sk = graft.Caching.materialize(
      hashed.distinct()
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k))

    // union sketch: k smallest distinct hashes of the combined sketches
    // (≤ 2k input rows → TakeOrderedAndProject)
    val skU = graft.Caching.materialize(
      sk.select("h").distinct().orderBy(asc("h")).limit(k))

    def grpStats(grp: String, cnt: String, theta: String): DataFrame =
      sk.filter(col("grp") === grp)
        .agg(count(lit(1)).as(cnt), max(col("h")).as(theta))
    val aRow = grpStats(typeA, "cnt_a", "th_a")
    val bRow = grpStats(typeB, "cnt_b", "th_b")
    val uRow = skU.agg(count(lit(1)).as("cnt_u"), max(col("h")).as("th_u"))

    // theta-intersection count: union-sketch hashes present in BOTH
    // sides' distinct-hash sets (any union hash ≤ θ that belongs to a
    // side is necessarily ≤ that side's h₍ₖ₎, so the full distinct
    // relation and the sketch agree below θ)
    val inA = skU.join(hashed.filter(col("grp") === typeA).select("h"), Seq("h"), "left_semi")
    val interSk = inA.join(hashed.filter(col("grp") === typeB).select("h"), Seq("h"), "left_semi")
      .agg(count(lit(1)).as("cnt_i"))

    val exact = two.agg(
      count_distinct(when(col("grp") === typeA, col("id"))).as("n_a"),
      count_distinct(when(col("grp") === typeB, col("id"))).as("n_b"),
      count_distinct(col("id")).as("n_union"))
    val exactInter = two.select("grp", "id").distinct()
      .groupBy("id").agg(count(lit(1)).as("ng"))
      .filter(col("ng") === 2).agg(count(lit(1)).as("n_inter"))

    // estimator: (k−1)·2⁶⁰·10⁶ div h₍ₖ₎; exact-by-construction below k
    exact.crossJoin(exactInter).crossJoin(aRow).crossJoin(bRow)
      .crossJoin(uRow).crossJoin(interSk)
      .withColumn("est_a_micro",
        when(col("cnt_a") < k, col("cnt_a") * lit(1000000L))
          .otherwise(expr(
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * $HashSpace * 1000000 div th_a AS BIGINT)")))
      .withColumn("est_b_micro",
        when(col("cnt_b") < k, col("cnt_b") * lit(1000000L))
          .otherwise(expr(
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * $HashSpace * 1000000 div th_b AS BIGINT)")))
      .withColumn("est_union_micro",
        when(col("cnt_u") < k, col("cnt_u") * lit(1000000L))
          .otherwise(expr(
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * $HashSpace * 1000000 div th_u AS BIGINT)")))
      // intersection: cnt_i ⁄ θ_u of the hash space; exact when the
      // union sketch holds everything
      .withColumn("est_inter_micro",
        when(col("cnt_u") < k, col("cnt_i") * lit(1000000L))
          .otherwise(expr(
            s"CAST(CAST(cnt_i AS DECIMAL(38,0)) * $HashSpace * 1000000 div th_u AS BIGINT)")))
      // cnt_u = 0 (both groups empty): Jaccard of two empty sets is 0
      // by convention — guarded like every other estimator column (the
      // DuckDB oracle's HUGEINT // 0 would ERROR where Spark yields NULL)
      .withColumn("jaccard_est_micro",
        when(col("cnt_u") === 0, lit(0L)).otherwise(
          expr("CAST(CAST(cnt_i AS DECIMAL(38,0)) * 1000000 div cnt_u AS BIGINT)")))
      .select(lit(k).as("k"), col("n_a"), col("n_b"), col("n_union"),
        col("n_inter"), col("est_a_micro"), col("est_b_micro"),
        col("est_union_micro"), col("est_inter_micro"),
        col("jaccard_est_micro"))
  }

  /** Correlated-sampling join-cardinality estimate (Vengerov et al.,
    * "Join Size Estimation Subject to Filter Conditions", VLDB 2015):
    * |L ⋈ R on key| = Σ_v fL(v)·fR(v), estimated from the keys whose
    * shared md5 hash falls at or below θ — the k-th smallest distinct
    * hash over the key-domain UNION. Both sides sample the SAME keys
    * (that is the correlated part: independent per-side samples miss
    * matching keys with probability ≈ 1 − p², the classic join-sample
    * failure), exact per-key frequencies are counted WITHIN the sample,
    * and the sum of products scales by the inverse inclusion
    * probability 2⁶⁰/θ. Fewer distinct keys than k ⇒ the sample is the
    * whole domain and the estimate is EXACT.
    *
    * Everything is md5-derived and integer-exact (the [[kmvCompare]]
    * discipline), so the estimate — not just a verdict — replays
    * bit-identically in the DuckDB oracle.
    *
    * Beside the estimate, the sampled pair products yield the top hot
    * JOIN KEY (max output pairs; ties by key desc — matching the
    * oracle's ORDER BY p DESC, kv DESC) with the
    * [[graft.operators.SkewJoin.skewReport]]-shaped advice derived from
    * output-pair shares: skew_x_milli = 1000·p_top·n_joined div Σp and
    * advised_salts = ⌈p_top·n_joined / Σp⌉. At 100 TB this is the point:
    * skewReport's exact per-key count is itself a corpus-wide shuffle,
    * while this sketch costs two distinct-shuffles of (key, hash), a
    * ≤ k-row threshold probe, and two broadcast-semi-join frequency
    * aggregates over sample-matched rows only.
    *
    * Headroom: in-sample Σ fL·fR ≤ ~10¹⁹ keeps Σp·2⁶⁰ inside
    * DECIMAL(38,0) (HUGEINT in the oracle); past the BIGINT read-out
    * range Spark RAISES (a null est/top cast with non-empty pairs is
    * the overflow signal — the q_ivm_variance guard pattern) where
    * DuckDB's CAST errors natively, so both engines fail loudly rather
    * than wrapping or publishing a silent 0/null.
    *
    * Output (one row): k, theta, n_sampled, n_joined, est_pairs,
    * top_key (string), top_pairs, skew_x_milli, advised_salts.
    */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      k: Int = 256): DataFrame = {
    require(k >= 2, "join-cardinality KMV needs k >= 2")
    val spark = left.sparkSession
    val lk = left.select(col(leftKey).cast("string").as("kv"))
      .filter(col("kv").isNotNull)
    val rk = right.select(col(rightKey).cast("string").as("kv"))
      .filter(col("kv").isNotNull)
    // the sketch domain: distinct union keys hashed once — cached only
    // for the duration of this builder (threshold probe + sample
    // collect are both driver-bounded), then released: the RETURNED
    // plan references the sample as a ≤ k-row LOCAL relation, never the
    // cached domain, so repeated calls in a long-lived session leak
    // nothing (the round-12 Ann.kmeansParallelInit advice class)
    val keys = graft.Caching.materialize(
      lk.distinct().unionByName(rk.distinct()).distinct()
        .select(col("kv"), Dedup.md5Base60(col("kv")).as("h")))
    val (nSampled, theta, sampleKvs) =
      try {
        // θ = k-th smallest distinct hash (TakeOrderedAndProject + 1-row
        // agg): bounded driver model state, the skew-advice dispatch idiom
        val thRow = keys.select("h").distinct().orderBy(asc("h")).limit(k)
          .agg(count(lit(1)).as("n"), max(col("h")).as("th")).head()
        val th = if (thRow.isNullAt(1)) 0L else thRow.getLong(1)
        // the sample itself is ≤ k keys (+ md5-collision ties) — model
        // state, collected once so the cache can be released here
        val kvs = keys.filter(col("h") <= lit(th)).select("kv")
          .collect().map(_.getString(0)).toSeq
        (thRow.getLong(0), th, kvs)
      } finally { keys.unpersist(); () }
    val exact = nSampled < k // sample == whole domain ⇒ scale 1

    import spark.implicits._
    val sample = sampleKvs.toDF("kv")
    def freq(side: DataFrame, cName: String): DataFrame =
      side.join(broadcast(sample), Seq("kv"))
        .groupBy("kv").agg(count(lit(1)).as(cName))
    // inner join: sampled keys absent from one side contribute 0 pairs
    val pairs = freq(lk, "fl").join(freq(rk, "fr"), Seq("kv"))
      .select(col("kv"),
        expr("CAST(fl AS DECIMAL(38,0)) * fr").as("p"))
    val est =
      if (exact) "sum_p"
      else s"sum_p * $HashSpace div $theta"
    // overflow discipline (q_ivm_variance pattern): a BIGINT cast (or a
    // DECIMAL(38) product) that nulls while its inputs are present IS
    // the overflow — raise loudly (DuckDB's CAST already errors), never
    // publish a silent 0/null. est's inputs (sum_p, theta) are never
    // null, so ANY null there is overflow; top.p is legitimately null
    // when no sampled key joins, so only a null CAST of a present value
    // raises there (the empty case coalesces to 0 outside).
    val estCast =
      expr(s"CASE WHEN ($est) IS NULL OR CAST($est AS BIGINT) IS NULL " +
        s"THEN raise_error('joinCardinality: est_pairs overflows BIGINT/DECIMAL(38)') " +
        s"ELSE CAST($est AS BIGINT) END")
    val topCast =
      expr("CASE WHEN top.p IS NOT NULL AND CAST(top.p AS BIGINT) IS NULL " +
        "THEN raise_error(CONCAT('joinCardinality: top_pairs overflows BIGINT: ', " +
        "CAST(top.p AS STRING))) ELSE CAST(top.p AS BIGINT) END")
    pairs.agg(
        coalesce(sum(col("p")), lit(0).cast(DecimalType(38, 0))).as("sum_p"),
        count(lit(1)).as("n_joined"),
        max(struct(col("p"), col("kv"))).as("top"))
      .select(lit(k).as("k"), lit(theta).as("theta"),
        lit(nSampled).as("n_sampled"), col("n_joined"),
        estCast.as("est_pairs"),
        coalesce(col("top.kv"), lit("")).as("top_key"),
        coalesce(topCast, lit(0L)).as("top_pairs"),
        expr("CAST(CASE WHEN n_joined = 0 THEN 0 " +
          "ELSE 1000 * top.p * n_joined div sum_p END AS BIGINT)")
          .as("skew_x_milli"),
        expr("CAST(CASE WHEN n_joined = 0 THEN 0 " +
          "ELSE (top.p * n_joined + sum_p - 1) div sum_p END AS BIGINT)")
          .as("advised_salts"))
  }

  /** DuckDB replay of [[joinCardinality]] over `leftTable.leftKey` ⋈
    * `rightTable.rightKey` — identical md5 tape, threshold, frequency
    * restriction, HUGEINT products and floor divisions, and the same
    * (p DESC, kv DESC) top-key tie-break.
    */
  def joinCardinalityOracleSql(leftTable: String, leftKey: String,
                               rightTable: String, rightKey: String,
                               k: Int = 256): String =
    s"""WITH lk AS MATERIALIZED (SELECT CAST($leftKey AS VARCHAR) AS kv FROM $leftTable
       |            WHERE $leftKey IS NOT NULL),
       |rk AS MATERIALIZED (SELECT CAST($rightKey AS VARCHAR) AS kv FROM $rightTable
       |       WHERE $rightKey IS NOT NULL),
       |keys AS MATERIALIZED (
       |  SELECT kv, ('0x' || substring(md5(kv), 1, 15))::BIGINT AS h
       |  FROM (SELECT DISTINCT kv FROM (
       |          SELECT kv FROM lk UNION SELECT kv FROM rk) u) d),
       |th AS MATERIALIZED (SELECT COUNT(*) AS n, COALESCE(MAX(h), 0) AS theta
       |       FROM (SELECT DISTINCT h FROM keys ORDER BY h LIMIT $k) t),
       |sample AS MATERIALIZED (
       |  SELECT kv FROM keys CROSS JOIN th WHERE h <= theta),
       |fl AS MATERIALIZED (SELECT kv, COUNT(*) AS f FROM lk
       |       WHERE kv IN (SELECT kv FROM sample) GROUP BY 1),
       |fr AS MATERIALIZED (SELECT kv, COUNT(*) AS f FROM rk
       |       WHERE kv IN (SELECT kv FROM sample) GROUP BY 1),
       |pairs AS MATERIALIZED (
       |  SELECT fl.kv, CAST(fl.f AS HUGEINT) * fr.f AS p
       |  FROM fl JOIN fr USING (kv)),
       |st AS MATERIALIZED (SELECT COALESCE(SUM(p), 0) AS sum_p,
       |              CAST(COUNT(*) AS BIGINT) AS n_joined FROM pairs),
       |top AS MATERIALIZED (SELECT kv AS top_kv, p AS top_p FROM pairs
       |        ORDER BY p DESC, kv DESC LIMIT 1)
       |SELECT $k AS k, th.theta AS theta, CAST(th.n AS BIGINT) AS n_sampled,
       |       st.n_joined,
       |       CAST(CASE WHEN th.n < $k THEN st.sum_p
       |                 ELSE st.sum_p * $HashSpace // th.theta
       |            END AS BIGINT) AS est_pairs,
       |       COALESCE(top.top_kv, '') AS top_key,
       |       CAST(COALESCE(top.top_p, 0) AS BIGINT) AS top_pairs,
       |       CAST(CASE WHEN st.n_joined = 0 THEN 0
       |                 ELSE 1000 * top.top_p * st.n_joined // st.sum_p
       |            END AS BIGINT) AS skew_x_milli,
       |       CAST(CASE WHEN st.n_joined = 0 THEN 0
       |                 ELSE (top.top_p * st.n_joined + st.sum_p - 1) // st.sum_p
       |            END AS BIGINT) AS advised_salts
       |FROM th CROSS JOIN st LEFT JOIN top ON TRUE""".stripMargin

  /** DuckDB replay of [[kmvCompare]] — identical md5 hashing, ordering,
    * and HUGEINT `//` arithmetic.
    */
  def kmvCompareOracleSql(twoSql: String, typeA: String, typeB: String,
                          k: Int = 64): String =
    s"""WITH two AS (SELECT DISTINCT grp, id FROM ($twoSql) t),
       |hashed AS (
       |  SELECT DISTINCT grp,
       |         ('0x' || substring(md5(id::VARCHAR), 1, 15))::BIGINT AS h
       |  FROM two),
       |sk AS (
       |  SELECT grp, h FROM (
       |    SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
       |    FROM hashed) t WHERE rn <= $k),
       |sku AS (SELECT DISTINCT h FROM sk ORDER BY h LIMIT $k),
       |arow AS (SELECT COUNT(*) AS cnt_a, MAX(h) AS th_a FROM sk WHERE grp = '$typeA'),
       |brow AS (SELECT COUNT(*) AS cnt_b, MAX(h) AS th_b FROM sk WHERE grp = '$typeB'),
       |urow AS (SELECT COUNT(*) AS cnt_u, MAX(h) AS th_u FROM sku),
       |irow AS (
       |  SELECT COUNT(*) AS cnt_i FROM sku
       |  WHERE h IN (SELECT h FROM hashed WHERE grp = '$typeA')
       |    AND h IN (SELECT h FROM hashed WHERE grp = '$typeB')),
       |ex AS (
       |  SELECT COUNT(DISTINCT CASE WHEN grp = '$typeA' THEN id END) AS n_a,
       |         COUNT(DISTINCT CASE WHEN grp = '$typeB' THEN id END) AS n_b,
       |         COUNT(DISTINCT id) AS n_union
       |  FROM two),
       |exi AS (
       |  SELECT COUNT(*) AS n_inter FROM (
       |    SELECT id FROM two GROUP BY 1 HAVING COUNT(*) = 2) t)
       |SELECT $k AS k, n_a, n_b, n_union, n_inter,
       |  CASE WHEN cnt_a < $k THEN cnt_a * 1000000
       |       ELSE CAST(${k - 1}::HUGEINT * $HashSpace * 1000000 // th_a AS BIGINT)
       |  END AS est_a_micro,
       |  CASE WHEN cnt_b < $k THEN cnt_b * 1000000
       |       ELSE CAST(${k - 1}::HUGEINT * $HashSpace * 1000000 // th_b AS BIGINT)
       |  END AS est_b_micro,
       |  CASE WHEN cnt_u < $k THEN cnt_u * 1000000
       |       ELSE CAST(${k - 1}::HUGEINT * $HashSpace * 1000000 // th_u AS BIGINT)
       |  END AS est_union_micro,
       |  CASE WHEN cnt_u < $k THEN cnt_i * 1000000
       |       ELSE CAST(cnt_i::HUGEINT * $HashSpace * 1000000 // th_u AS BIGINT)
       |  END AS est_inter_micro,
       |  CASE WHEN cnt_u = 0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(cnt_i::HUGEINT * 1000000 // cnt_u AS BIGINT)
       |  END AS jaccard_est_micro
       |FROM ex CROSS JOIN exi CROSS JOIN arow CROSS JOIN brow
       |        CROSS JOIN urow CROSS JOIN irow""".stripMargin
}
