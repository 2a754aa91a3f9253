package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Jensen–Shannon divergence of each source's token distribution from
  * the corpus-wide distribution (Lin, IEEE Trans. IT 37:145, 1991) —
  * the standard "which slice of my corpus is off-distribution" read a
  * curation pipeline runs before mixing sources (and the symmetric,
  * bounded [0, ln 2] cousin of the KL the PSI monitor approximates).
  *
  * JSD(p‖q) = ½KL(p‖m) + ½KL(q‖m), m = ½(p+q), with p the source's
  * unigram distribution and q the corpus's. Every ln argument is a
  * ratio of EXACT integer counts — 2·c_ts·N / (c_ts·N + c_t·N_s) for
  * the p-side and 2·c_t·N_s / (c_ts·N + c_t·N_s) for the q-side — so
  * both engines feed identical doubles to ln; each ln is quantized to
  * nano units (the q_psi_drift convention) and folded with integer
  * count weights in DECIMAL(38,0), with ONE integer division per KL
  * term. Tokens absent from the source contribute the closed-form
  * ln 2 · (N − Σ_{t∈s} c_t) / N mass to the q-side — the rearrangement
  * that keeps the join sparse (only (source, token) pairs that EXIST
  * are enumerated; the vocabulary × sources cross product never
  * materializes).
  *
  * Scale: one token explode (the BM25 tokenization), two hash aggs to
  * the (source, token) and token count relations, one join between
  * them (vocabulary-sized, sparse), and a per-source fold. The count
  * products c·N stay < 2⁶³ up to ~3·10⁹ total tokens per the long
  * arithmetic here; past that, lift the products to DECIMAL(38,0)
  * (documented headroom bound, same convention as HITS).
  */
object Divergence {

  private val Ln2Nano = 693147181L // floor(ln(2)·1e9 + 0.5), shared literal

  /** (source, n_tokens, jsd_nano, jsd) per source — jsd_nano is the
    * exact hash-compared integer; jsd is the convenience double.
    */
  def sourceTokenJsd(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), col("source"),
        explode(split(trim(col("text")), "\\s+")).as("raw"))
      .filter(col("raw") =!= "")
      .select(col("source"), lower(col("raw")).as("token"))
    val bySrcTok = toks.groupBy("source", "token").agg(count(lit(1)).as("c_ts"))
    val byTok = toks.groupBy("token").agg(count(lit(1)).as("c_t"))
    val bySrc = bySrcTok.groupBy("source").agg(sum("c_ts").as("n_s"))
    val total = byTok.agg(sum("c_t").as("n"))
    val d38 = DecimalType(38, 0)
    val joined = bySrcTok
      .join(byTok, "token")
      .join(bySrc, "source")
      .crossJoin(broadcast(total))
    val denom = col("c_ts") * col("n") + col("c_t") * col("n_s")
    val lp = floor(log((lit(2L) * col("c_ts") * col("n")).cast("double") /
      denom.cast("double")) * 1e9 + 0.5).cast("long")
    val lq = floor(log((lit(2L) * col("c_t") * col("n_s")).cast("double") /
      denom.cast("double")) * 1e9 + 0.5).cast("long")
    val perSource = joined
      .groupBy("source")
      .agg(first("n_s").as("n_s"), first("n").as("n"),
        sum((col("c_ts") * lp).cast(d38)).as("p_fold"),
        sum((col("c_t") * lq).cast(d38)).as("q_fold_present"),
        sum(col("c_t")).as("ct_present"))
    // final fold in IEEE doubles of exact integers: /, + and the 1e-6
    // quantization are correctly rounded on both engines, so jsd_micro
    // hash-compares (integer `div` would differ on near-zero negative
    // folds: Spark truncates toward zero, DuckDB floors)
    val qFull = col("q_fold_present") +
      lit(Ln2Nano).cast(d38) * (col("n") - col("ct_present")).cast(d38)
    val jsdD = (col("p_fold").cast("double") / col("n_s") +
      qFull.cast("double") / col("n")) / 2.0 / 1e9
    perSource
      .select(col("source"), col("n_s").as("n_tokens"),
        floor(jsdD * 1e6 + 0.5).cast("long").as("jsd_micro"),
        jsdD.as("jsd"))
  }

  def sourceTokenJsdOracleSql: String =
    s"""WITH toks AS (
      |  SELECT d.source, lower(t) AS token
      |  FROM (SELECT doc_id, source,
      |          unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
      |        FROM documents) d
      |  WHERE t <> ''),
      |st AS (SELECT source, token, COUNT(*) AS c_ts FROM toks GROUP BY 1, 2),
      |tk AS (SELECT token, COUNT(*) AS c_t FROM toks GROUP BY 1),
      |src AS (SELECT source, CAST(SUM(c_ts) AS BIGINT) AS n_s FROM st GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n FROM tk),
      |terms AS (
      |  SELECT st.source, src.n_s, tot.n, tk.c_t,
      |         st.c_ts * CAST(floor(ln(CAST(2 * st.c_ts * tot.n AS DOUBLE) /
      |           (st.c_ts * tot.n + tk.c_t * src.n_s)) * 1e9 + 0.5) AS BIGINT)
      |           AS p_term,
      |         tk.c_t * CAST(floor(ln(CAST(2 * tk.c_t * src.n_s AS DOUBLE) /
      |           (st.c_ts * tot.n + tk.c_t * src.n_s)) * 1e9 + 0.5) AS BIGINT)
      |           AS q_term
      |  FROM st JOIN tk ON tk.token = st.token
      |          JOIN src ON src.source = st.source
      |          CROSS JOIN tot),
      |folded AS (
      |  SELECT source, n_s, n,
      |         SUM(CAST(p_term AS HUGEINT)) AS p_fold,
      |         SUM(CAST(q_term AS HUGEINT)) AS q_fold_present,
      |         CAST(SUM(c_t) AS HUGEINT) AS ct_present
      |  FROM terms GROUP BY 1, 2, 3),
      |jsd AS (
      |  SELECT source, n_s,
      |         (CAST(p_fold AS DOUBLE) / n_s +
      |          CAST(q_fold_present + $Ln2Nano * (n - ct_present) AS DOUBLE) / n)
      |           / 2.0 / 1e9 AS jsd_d
      |  FROM folded)
      |SELECT source, n_s AS n_tokens,
      |       CAST(floor(jsd_d * 1e6 + 0.5) AS BIGINT) AS jsd_micro,
      |       jsd_d AS jsd
      |FROM jsd""".stripMargin
}
