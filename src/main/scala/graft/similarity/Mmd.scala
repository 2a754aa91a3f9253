package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear-time Maximum Mean Discrepancy (Gretton et al., JMLR 2012,
  * Lemma 14): the two-sample distribution-distance test a training-data
  * pipeline runs on EMBEDDINGS — "did this week's corpus drift from the
  * reference batch?" — where the scalar drift family
  * ([[graft.analytics.Drift]]: KS/PSI/W1) only sees one column at a
  * time. The quadratic MMD² is O(n²) kernel evaluations; the linear
  * statistic pairs consecutive samples and averages
  * h = k(x₁,x₂) + k(y₁,y₂) − k(x₁,y₂) − k(x₂,y₁) over disjoint
  * quadruples — one pass, unbiased, the scale path.
  *
  * Determinism discipline: pairing is by GLOBAL ROW NUMBER over vec_id
  * (the two-pass range-partitioned numbering,
  * [[graft.operators.GlobalRank.withGlobalRowNumber]] — no one-partition
  * window), the RBF kernel uses the FIXED bandwidth 2σ² = dim (no
  * data-dependent median heuristic to replay), squared distances are
  * rounded at 1e-6 before the exp (the k-means oracle convention), and
  * each kernel value is micro-quantized immediately after its single
  * float exp — all sums and the final mean are integer arithmetic, so
  * the DuckDB replay matches to the last digit.
  *
  * Two rows ship per call: the SIGNAL pair (label 0 vs label 1 — two
  * genuinely different generating classes) and the NULL pair (an
  * even/odd vec_id split WITHIN label 0 — same distribution, so MMD²
  * should sit near zero). Reading them together is the test's built-in
  * calibration: signal ≫ null or the kernel/bandwidth is wrong.
  *
  * Output: (pair, n_quads, mmd2_micro).
  */
object Mmd {

  /** Micro-quantized RBF kernel column over two double-array columns. */
  private def kernelMicro(a: String, b: String, dim: Int): org.apache.spark.sql.Column =
    expr(
      s"""CAST(floor(exp(-round(aggregate(zip_with($a, $b,
         |  (p, q) -> (p - q) * (p - q)), CAST(0 AS DOUBLE),
         |  (acc, x) -> acc + x), 6) / $dim) * 1000000 + 0.5) AS BIGINT)"""
        .stripMargin.replace("\n", " "))

  /** Disjoint consecutive pairs of one sample, keyed by pair index:
    * (q, v1, v2). Rows beyond the last full pair drop.
    */
  private def pairedSample(side: DataFrame): DataFrame = {
    val rn = graft.operators.GlobalRank
      .withGlobalRowNumber(side, Seq("vec_id"), "__rn")
    val a = rn.filter((col("__rn") - 1) % 2 === 0)
      .select(expr("(__rn - 1) div 2").as("q"), col("v").as("v1"))
    val b = rn.filter((col("__rn") - 1) % 2 === 1)
      .select(expr("(__rn - 1) div 2").as("q"), col("v").as("v2"))
    a.join(b, "q")
  }

  private def mmdOf(xs: DataFrame, ys: DataFrame, tag: String,
                    dim: Int): DataFrame = {
    val xp = pairedSample(xs)
    val yp = pairedSample(ys)
      .withColumnRenamed("v1", "w1").withColumnRenamed("v2", "w2")
    xp.join(yp, "q")
      .select((kernelMicro("v1", "v2", dim) + kernelMicro("w1", "w2", dim)
        - kernelMicro("v1", "w2", dim) - kernelMicro("v2", "w1", dim))
        .as("h"))
      .agg(count(lit(1)).as("n_quads"), sum(col("h")).as("__sh"))
      .select(lit(tag).as("pair"), col("n_quads"),
        expr("CAST(__sh div n_quads AS BIGINT)").as("mmd2_micro"))
  }

  /** The signal (label 0 vs 1) and null (even/odd split of label 0)
    * linear-MMD² rows over the embeddings table.
    */
  def mmdLinearChecked(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val l0 = base.filter(col("label") === 0).select("vec_id", "v")
    val l1 = base.filter(col("label") === 1).select("vec_id", "v")
    val signal = mmdOf(l0, l1, "class0_vs_class1", dim)
    val nullPair = mmdOf(
      l0.filter(col("vec_id") % 2 === 0), l0.filter(col("vec_id") % 2 === 1),
      "class0_null_split", dim)
    signal.unionByName(nullPair)
  }

  /** DuckDB twin: window row numbers stand in for the two-pass global
    * numbering (oracle scale is sf-bounded), identical rounding, exp,
    * and integer quantization.
    */
  def mmdLinearOracleSql(dim: Int = 64): String = {
    def kern(a: String, b: String) =
      s"""CAST(floor(exp(-round(list_sum(list_transform(range(1, ${dim + 1}),
         |  i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), 6) / $dim)
         |  * 1000000 + 0.5) AS BIGINT)""".stripMargin.replace("\n", " ")
    def paired(src: String, name: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT a.q, a.v AS v1, b.v AS v2 FROM
         |    (SELECT (rn - 1) // 2 AS q, v FROM $src WHERE (rn - 1) % 2 = 0) a
         |    JOIN
         |    (SELECT (rn - 1) // 2 AS q, v FROM $src WHERE (rn - 1) % 2 = 1) b
         |    USING (q))""".stripMargin
    def side(pred: String, name: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS rn, v
         |  FROM e WHERE $pred)""".stripMargin
    // Spark's `div` truncates toward zero; DuckDB's `//` floors — the
    // sign-split keeps the two engines identical on negative h sums
    def mmd(xp: String, yp: String, tag: String) =
      s"""SELECT pair, n_quads,
         |       CASE WHEN sh >= 0 THEN CAST(sh // n_quads AS BIGINT)
         |            ELSE -CAST((-sh) // n_quads AS BIGINT) END AS mmd2_micro
         |FROM (
         |  SELECT '$tag' AS pair, CAST(COUNT(*) AS BIGINT) AS n_quads,
         |         CAST(SUM(${kern("x.v1", "x.v2")} + ${kern("y.v1", "y.v2")}
         |                  - ${kern("x.v1", "y.v2")} - ${kern("x.v2", "y.v1")})
         |              AS BIGINT) AS sh
         |  FROM $xp x JOIN $yp y USING (q))""".stripMargin
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, label,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |${side("label = 0", "s0")},
       |${side("label = 1", "s1")},
       |${side("label = 0 AND vec_id % 2 = 0", "s0e")},
       |${side("label = 0 AND vec_id % 2 = 1", "s0o")},
       |${paired("s0", "p0")},
       |${paired("s1", "p1")},
       |${paired("s0e", "p0e")},
       |${paired("s0o", "p0o")}
       |${mmd("p0", "p1", "class0_vs_class1")}
       |UNION ALL
       |${mmd("p0e", "p0o", "class0_null_split")}""".stripMargin
  }
}
