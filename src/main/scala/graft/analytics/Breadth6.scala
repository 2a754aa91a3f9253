package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 analytics breadth: robust regression (Theil–Sen), the k-arm
  * parametric test (one-way ANOVA), and market concentration (HHI) —
  * the three statistics a warehouse analytics layer reaches for after
  * the OLS trend / Welch pair / Gini family already shipped.
  *
  * Shared exactness discipline (see [[Metrics]], [[Drift]]): money folds
  * to exact integer units up front (cents, or DECIMAL(18,4) sub-cent
  * "decimils" for discounted revenue), every sum runs in long or
  * DECIMAL(38,0), integer division is the TRUNCATING `div`/`//` (both
  * Spark and DuckDB truncate toward zero — verified on negatives, so
  * signed slopes are safe), and each result performs at most ONE final
  * IEEE expression folded to 1e-6.
  *
  * Reference anchor: the reference's analytics stop at grouped sums and
  * top-K (`filmETLs.ipynb#cell11-13`); these are the next statistics its
  * warehouse users ask of the same tables at 100 TB.
  */
object Breadth6 {

  private val Dec = DecimalType(38, 0)

  private def fold6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  private def cents(c: Column): Column =
    floor(c * 100 + 0.5).cast("long")

  // ------------------------------------------------------- Theil–Sen

  /** Theil–Sen robust trend slope of monthly revenue (Theil 1950; Sen,
    * JASA 1968): the MEDIAN of all pairwise slopes
    * `(y_j − y_i) / (x_j − x_i)` over the monthly series — the robust
    * companion to the OLS `q_trend_slope`, with a 29.3% breakdown point
    * (a third of the months can be corrupted before the slope moves).
    *
    * Exactness: the corpus collapses to the month-bounded series of
    * exact cents first; each pairwise slope is micro-quantized by ONE
    * truncating integer division `(Δcents·10⁶) div Δmonths` (truncation
    * toward zero matches DuckDB `//` exactly, signs included); the
    * median over the quantized slopes is read off the cumulative count
    * in pure integer comparisons, doubled (lower+upper order statistic)
    * so even pair counts never divide. No float compares anywhere.
    *
    * Scale shape: ONE shuffle collapses the corpus to ≤ a few hundred
    * monthly rows; the pair self-join and the ordered window run over
    * the months²-bounded domain (≤ ~10⁴ rows for a decade of months) —
    * the documented bounded-domain window argument ([[Metrics]]).
    * Headroom: Δcents·10⁶ must fit a signed long — monthly revenue to
    * $9.2·10¹⁴ — past that, lower the quantizer (the fallback knob).
    *
    * Output: one row (n_months, n_pairs, slope2_micro) where
    * slope2_micro = lower+upper doubled median of the micro-quantized
    * cents-per-month slopes (exact BIGINT, hash-compares as integers).
    */
  def theilSenSlope(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(trunc(col("o_orderdate").cast("date"), "month").as("m"))
      .agg(sum(cents(col("o_totalprice"))).as("y"))
      .select((year(col("m")) * 12 + month(col("m"))).cast("long").as("x"),
        col("y"))
    val a = monthly.select(col("x").as("x1"), col("y").as("y1"))
    val b = monthly.select(col("x").as("x2"), col("y").as("y2"))
    val pairs = a.join(b, col("x1") < col("x2"))
      .select(expr(
        "cast(y2 - y1 as decimal(38,0)) * 1000000 div (x2 - x1)").as("smicro"))
    val byval = pairs.groupBy("smicro").agg(count(lit(1)).as("c"))
    val tot = monthly.agg(count(lit(1)).as("n_months"))
      .crossJoin(byval.agg(sum(col("c")).as("n_pairs")))
    val w = Window.orderBy("smicro")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byval.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(tot))
      .agg(
        first(col("n_months")).as("n_months"),
        first(col("n_pairs")).as("n_pairs"),
        (min(when(col("cum") >= expr("(n_pairs + 1) div 2"), col("smicro"))) +
          min(when(col("cum") >= expr("n_pairs div 2 + 1"), col("smicro"))))
          .as("slope2_micro"))
      .select(col("n_months"), col("n_pairs"),
        col("slope2_micro").cast("long").as("slope2_micro"))
  }

  /** DuckDB replay of [[theilSenSlope]] — identical quantization and
    * order-statistic reads; `//` truncates toward zero like Spark `div`.
    */
  def theilSenOracleSql(): String =
    """WITH monthly AS (
      |  SELECT CAST(year(date_trunc('month', o_orderdate)) * 12
      |              + month(date_trunc('month', o_orderdate)) AS BIGINT) AS x,
      |         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
      |  FROM orders GROUP BY date_trunc('month', o_orderdate)),
      |pairs AS (
      |  SELECT CAST(CAST(b.y - a.y AS HUGEINT) * 1000000 // (b.x - a.x)
      |              AS BIGINT) AS smicro
      |  FROM monthly a JOIN monthly b ON a.x < b.x),
      |byval AS (SELECT smicro, COUNT(*) AS c FROM pairs GROUP BY 1),
      |tot AS (
      |  SELECT (SELECT COUNT(*) FROM monthly) AS n_months,
      |         (SELECT SUM(c) FROM byval) AS n_pairs),
      |run AS (
      |  SELECT smicro,
      |         SUM(c) OVER (ORDER BY smicro
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM byval)
      |SELECT CAST(n_months AS BIGINT) AS n_months,
      |       CAST(n_pairs AS BIGINT) AS n_pairs,
      |       CAST(MIN(CASE WHEN cum >= (n_pairs + 1) // 2 THEN smicro END)
      |          + MIN(CASE WHEN cum >= n_pairs // 2 + 1 THEN smicro END)
      |            AS BIGINT) AS slope2_micro
      |FROM run CROSS JOIN tot
      |GROUP BY n_months, n_pairs""".stripMargin

  // ------------------------------------------------------ one-way ANOVA

  /** The five TPC-H order-priority arms, fixed at plan build — pivoting
    * on known literals makes the cross-arm fold a FIXED expression tree
    * (the [[Metrics.welchTTest]] two-column pattern generalized to k),
    * so no cross-row IEEE summation order ever matters.
    */
  private val PriorityArms: Seq[String] = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** One-way ANOVA F-test of order value across the five order-priority
    * arms (Fisher 1925) — the k-arm generalization of `q_ab_ttest`:
    * does ANY priority class have a different mean ticket?
    *
    *   F = (SSB/(k−1)) / (SSW/(N−k)),   η² = SSB/(SSB+SSW)
    *
    * Exactness: per-arm (n, Σx, Σx²) power sums over exact integer
    * cents in DECIMAL(38,0), pivoted into 3k fixed columns by the known
    * arm literals in ONE aggregate; SSB/SSW/F are then a single fixed
    * left-associated double expression evaluated identically by both
    * engines — the Welch convention, k-ary.
    *
    * Scale shape: one map-side-combined aggregate over the corpus; no
    * window, no join, no second pass. Arms whose count is zero drop out
    * of every term (guarded to 0), and k counts only present arms.
    *
    * Output: one row (k_arms, n_total, f_stat, eta2).
    */
  def anovaPriority(orders: DataFrame): DataFrame = {
    val g = orders.select(cents(col("o_totalprice")).as("x"),
      col("o_orderpriority").as("arm"))
    val aggs = PriorityArms.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        sum(when(col("arm") === p, 1L).otherwise(0L)).as(s"n$i"),
        sum(when(col("arm") === p, col("x")).otherwise(0L).cast(Dec)).as(s"s$i"),
        sum(when(col("arm") === p, col("x") * col("x")).otherwise(0L).cast(Dec))
          .as(s"q$i"))
    }
    val sums = g.agg(aggs.head, aggs.tail: _*)
    val idx = PriorityArms.indices
    def n(i: Int) = col(s"n$i").cast("double")
    def s(i: Int) = col(s"s$i").cast("double")
    def q(i: Int) = col(s"q$i").cast("double")
    val nTot = idx.map(i => col(s"n$i")).reduce(_ + _)
    val kArms = idx.map(i =>
      when(col(s"n$i") > 0, 1).otherwise(0): Column).reduce(_ + _)
    val nD = nTot.cast("double")
    val sTot = idx.map(s).reduce(_ + _)
    val grand = sTot / nD
    // SSB = Σ n_g·(m_g − m)²; SSW = Σ (Σx²_g − (Σx_g)²/n_g); each term
    // guarded to 0 for an absent arm so the fixed tree stays total
    val ssb = idx.map(i =>
      when(col(s"n$i") > 0,
        n(i) * (s(i) / n(i) - grand) * (s(i) / n(i) - grand))
        .otherwise(0.0): Column).reduce(_ + _)
    val ssw = idx.map(i =>
      when(col(s"n$i") > 0, q(i) - s(i) * s(i) / n(i))
        .otherwise(0.0): Column).reduce(_ + _)
    val kD = kArms.cast("double")
    val f = (ssb / (kD - 1)) / (ssw / (nD - kD))
    sums.select(kArms.cast("int").as("k_arms"), nTot.as("n_total"),
      fold6(f).as("f_stat"), fold6(ssb / (ssb + ssw)).as("eta2"))
  }

  /** DuckDB replay of [[anovaPriority]] — identical pivot and fixed
    * expression shapes (same literal order, same association).
    */
  def anovaOracleSql(): String = {
    val idx = PriorityArms.indices
    val pivots = PriorityArms.zipWithIndex.map { case (p, i) =>
      s"""SUM(CASE WHEN arm = '$p' THEN 1 ELSE 0 END) AS n$i,
         |         SUM(CASE WHEN arm = '$p' THEN CAST(x AS HUGEINT) ELSE 0 END) AS s$i,
         |         SUM(CASE WHEN arm = '$p' THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS q$i""".stripMargin
    }.mkString(",\n         ")
    val nTot = idx.map(i => s"n$i").mkString(" + ")
    val kArms = idx.map(i => s"CASE WHEN n$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    val sTot = idx.map(i => s"CAST(s$i AS DOUBLE)").mkString(" + ")
    def ssbTerm(i: Int) =
      s"CASE WHEN n$i > 0 THEN CAST(n$i AS DOUBLE) * (CAST(s$i AS DOUBLE) / CAST(n$i AS DOUBLE) - grand) * (CAST(s$i AS DOUBLE) / CAST(n$i AS DOUBLE) - grand) ELSE 0e0 END"
    def sswTerm(i: Int) =
      s"CASE WHEN n$i > 0 THEN CAST(q$i AS DOUBLE) - CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE) / CAST(n$i AS DOUBLE) ELSE 0e0 END"
    s"""WITH g AS (
       |  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS x,
       |         o_orderpriority AS arm
       |  FROM orders),
       |sums AS (
       |  SELECT $pivots
       |  FROM g),
       |d AS (
       |  SELECT CAST($kArms AS INTEGER) AS k_arms,
       |         CAST($nTot AS BIGINT) AS n_total,
       |         ($sTot) / CAST($nTot AS DOUBLE) AS grand, *
       |  FROM sums),
       |e AS (
       |  SELECT k_arms, n_total,
       |         ${idx.map(ssbTerm).mkString(" + ")} AS ssb,
       |         ${idx.map(sswTerm).mkString(" + ")} AS ssw
       |  FROM d)
       |SELECT k_arms, n_total,
       |       FLOOR((ssb / (CAST(k_arms AS DOUBLE) - 1))
       |             / (ssw / (CAST(n_total AS DOUBLE) - CAST(k_arms AS DOUBLE)))
       |             * 1e6 + 0.5) / 1e6 AS f_stat,
       |       FLOOR(ssb / (ssb + ssw) * 1e6 + 0.5) / 1e6 AS eta2
       |FROM e""".stripMargin
  }

  // ------------------------------------------------- HHI concentration

  /** Herfindahl–Hirschman concentration of shipped revenue across
    * suppliers, per region — the antitrust-standard concentration index
    * (Herfindahl 1950; the DOJ horizontal-merger screen) beside the
    * Gini/ABC family: HHI = Σ_s share_s², 1/n for perfect competition,
    * 1 for monopoly.
    *
    * Exactness: per-(region, supplier) revenue is the exact
    * DECIMAL(18,4) discounted volume folded to integer DECIMILS
    * (10⁻⁴ dollars — no rounding at all, the `q_market_share` money
    * convention); each supplier's share is micro-quantized by ONE
    * integer division against the region total, and the index is the
    * exact long Σ share_micro² div 10⁶ — every output column an
    * integer, scale-invariant headroom (Σ share_micro = 10⁶ caps
    * Σ share² at 10¹² regardless of corpus size).
    *
    * Scale shape: one shuffle to (region × supplier) — suppliers are
    * dim-bounded; region totals are a 5-row aggregate broadcast back.
    *
    * Output: (r_name, n_suppliers, hhi_micro, top_share_micro).
    */
  def hhiSupplierConcentration(lineitem: DataFrame, supplier: DataFrame,
                               nation: DataFrame, region: DataFrame): DataFrame = {
    val vol = expr(
      "cast(cast(l_extendedprice as decimal(18,2)) * " +
        "(1 - cast(l_discount as decimal(18,2))) as decimal(18,4))")
    val suppRegion = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name"))
    val perSupp = lineitem
      .select(col("l_suppkey"), vol.as("volume"))
      .join(broadcast(suppRegion), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("r_name"), col("s_suppkey"))
      .agg((sum(col("volume")) * 10000).cast(Dec).as("v"))
    val totals = perSupp.groupBy("r_name").agg(sum(col("v")).as("vtot"))
    perSupp.join(broadcast(totals), "r_name")
      .select(col("r_name"), expr("v * 1000000 div vtot").as("share_micro"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_suppliers"),
        expr("sum(share_micro * share_micro) div 1000000").as("hhi_micro"),
        max(col("share_micro")).as("top_share_micro"))
  }

  /** DuckDB replay of [[hhiSupplierConcentration]]. */
  def hhiOracleSql(): String =
    """WITH sr AS (
      |  SELECT s.s_suppkey, r.r_name
      |  FROM supplier s
      |  JOIN nation n ON n.n_nationkey = s.s_nationkey
      |  JOIN region r ON r.r_regionkey = n.n_regionkey),
      |per AS (
      |  SELECT sr.r_name, l.l_suppkey,
      |         CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
      |                  (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
      |              * 10000 AS HUGEINT) AS v
      |  FROM lineitem l JOIN sr ON sr.s_suppkey = l.l_suppkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT r_name, SUM(v) AS vtot FROM per GROUP BY 1),
      |shares AS (
      |  SELECT per.r_name, CAST(per.v * 1000000 // tot.vtot AS BIGINT) AS share_micro
      |  FROM per JOIN tot USING (r_name))
      |SELECT r_name, COUNT(*) AS n_suppliers,
      |       CAST(SUM(share_micro * share_micro) // 1000000 AS BIGINT) AS hhi_micro,
      |       MAX(share_micro) AS top_share_micro
      |FROM shares GROUP BY 1""".stripMargin
}
