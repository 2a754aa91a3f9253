package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 analytics breadth, second batch: rank correlation
  * (Kendall τ-b), categorical association (Cramér's V), demand
  * variability classes (XYZ, the CV² companion to the ABC Pareto
  * classes), income-concentration curve points (Lorenz deciles — the
  * curve behind the shipped Gini scalar), and windowed trend (12-month
  * rolling OLS slope/intercept).
  *
  * Shared exactness discipline (see [[Metrics]], [[Drift]],
  * [[Breadth6]]): money folds to exact integer cents up front, every
  * sum/compare runs in long or DECIMAL(38,0), classification happens in
  * PURE integer inequalities (no float thresholds), and each emitted
  * statistic performs at most ONE final IEEE expression folded to 1e-6
  * — so the DuckDB replay is bit-equal by construction.
  *
  * Reference anchor: the reference's analytics stop at grouped sums and
  * top-K (`filmETLs.ipynb#cell11-13`); these are the association /
  * inventory-planning statistics its warehouse users ask of the same
  * tables at 100 TB.
  */
object Breadth7 {

  private val Dec = DecimalType(38, 0)

  private def fold6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  private def cents(c: Column): Column =
    floor(c * 100 + 0.5).cast("long")

  // ----------------------------------------------------- Kendall τ-b

  /** Kendall rank correlation (τ-b, the tie-corrected form; Kendall,
    * Biometrika 1938) between monthly revenue and monthly order count,
    * per order priority — "do busier months rank as richer months?"
    * asked robustly: τ depends only on pair ORDERINGS, so it ignores
    * revenue outliers that drag Pearson around.
    *
    * Exactness: the corpus collapses per (priority, month) to exact
    * (cents, count) longs; every pair is classified by two integer
    * sign comparisons (concordant / discordant / tied on either side);
    * τ-b = (C − D) / √((n₀−t_y)(n₀−t_c)) is the one final double. The
    * pair join runs on the month-bounded series (≤ ~10⁴ pairs per
    * priority for a decade — the [[Breadth6.theilSenSlope]] bounded-
    * domain argument), NOT on the raw corpus.
    *
    * Degenerate series guard ([[rollingRegression]] discipline): a
    * priority whose revenue (or count) is fully tied across all month
    * pairs has (n₀−t_y)(n₀−t_c) = 0 — τ-b is undefined there, so both
    * the Spark expression and the oracle emit NULL rather than a
    * platform-dependent NaN/±Inf.
    *
    * Output: one row per priority
    * (o_orderpriority, n_months, n_pairs, conc, disc, tau_b).
    */
  def kendallTau(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(col("o_orderpriority"),
        trunc(col("o_orderdate").cast("date"), "month").as("m"))
      .agg(sum(cents(col("o_totalprice"))).as("y"),
        count(lit(1)).as("c"))
    val a = monthly.select(col("o_orderpriority"), col("m").as("m1"),
      col("y").as("y1"), col("c").as("c1"))
    val b = monthly.select(col("o_orderpriority").as("p2"), col("m").as("m2"),
      col("y").as("y2"), col("c").as("c2"))
    val pairs = a.join(b,
        col("o_orderpriority") === col("p2") && col("m1") < col("m2"))
      .select(col("o_orderpriority"),
        signum(col("y2") - col("y1")).cast("long").as("sy"),
        signum(col("c2") - col("c1")).cast("long").as("sc"))
    pairs.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sy") * col("sc") > 0, 1L).otherwise(0L)).as("conc"),
        sum(when(col("sy") * col("sc") < 0, 1L).otherwise(0L)).as("disc"),
        sum(when(col("sy") === 0, 1L).otherwise(0L)).as("ty"),
        sum(when(col("sc") === 0, 1L).otherwise(0L)).as("tc"))
      .join(monthly.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_months")), "o_orderpriority")
      .select(col("o_orderpriority"), col("n_months"), col("n_pairs"),
        col("conc"), col("disc"),
        when((col("n_pairs") - col("ty")) * (col("n_pairs") - col("tc")) === 0,
          lit(null).cast("double"))
          .otherwise(fold6((col("conc") - col("disc")).cast("double") /
            sqrt(((col("n_pairs") - col("ty")) *
              (col("n_pairs") - col("tc"))).cast("double")))).as("tau_b"))
  }

  /** DuckDB replay of [[kendallTau]] — identical sign classification
    * and the same single final √ expression.
    */
  def kendallTauOracleSql(): String =
    """WITH monthly AS (
      |  SELECT o_orderpriority, date_trunc('month', o_orderdate) AS m,
      |         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y,
      |         COUNT(*) AS c
      |  FROM orders GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.o_orderpriority,
      |         CAST(SIGN(b.y - a.y) AS BIGINT) AS sy,
      |         CAST(SIGN(b.c - a.c) AS BIGINT) AS sc
      |  FROM monthly a JOIN monthly b
      |    ON a.o_orderpriority = b.o_orderpriority AND a.m < b.m),
      |agg AS (
      |  SELECT o_orderpriority, COUNT(*) AS n_pairs,
      |         SUM(CASE WHEN sy * sc > 0 THEN 1 ELSE 0 END) AS conc,
      |         SUM(CASE WHEN sy * sc < 0 THEN 1 ELSE 0 END) AS disc,
      |         SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS ty,
      |         SUM(CASE WHEN sc = 0 THEN 1 ELSE 0 END) AS tc
      |  FROM pairs GROUP BY 1),
      |nm AS (SELECT o_orderpriority, COUNT(*) AS n_months FROM monthly GROUP BY 1)
      |SELECT agg.o_orderpriority, n_months,
      |       CAST(n_pairs AS BIGINT) AS n_pairs,
      |       CAST(conc AS BIGINT) AS conc, CAST(disc AS BIGINT) AS disc,
      |       CASE WHEN (n_pairs - ty) * (n_pairs - tc) = 0 THEN NULL
      |            ELSE FLOOR(CAST(conc - disc AS DOUBLE)
      |                 / SQRT(CAST((n_pairs - ty) * (n_pairs - tc) AS DOUBLE))
      |                 * 1e6 + 0.5) / 1e6 END AS tau_b
      |FROM agg JOIN nm USING (o_orderpriority)""".stripMargin

  // ----------------------------------------------------- Cramér's V

  /** Cramér's V association (Cramér, "Mathematical Methods of
    * Statistics", 1946) between order priority and order status — the
    * bounded [0,1] companion to the shipped mutual information and
    * χ²-drift operators: V = √(χ² / (n·(min(r,c) − 1))).
    *
    * Exactness: χ² is assembled from the exact contingency longs with
    * the per-cell contribution in EXACT rational form
    * `(n·obs − r·c)² / (r·c·n)`, milli-quantized by one truncating
    * DECIMAL division per cell ([[Metrics.mutualInfo]] discipline), and
    * summed as a long; V is the one final √. Headroom: the per-cell
    * numerator (n·nij − ra·cb)²·10³ must fit DECIMAL(38,0); a strongly
    * associated 2×2 table drives |n·nij − ra·cb| toward n²/4, so the
    * construction is exact through n ≈ 10⁹ rows — NOT unbounded. Past
    * that, non-ANSI Spark would silently NULL the overflowed cell and
    * `sum()` would skip it (a silently wrong χ²), so the operator
    * measures the ACTUAL max |n·nij − ra·cb| over the bounded r×c grid
    * (one cheap driver-side action) and fails loudly via `require`
    * when the squared milli term would exceed 38 digits. A corpus that
    * trips it should pre-aggregate (sample or stratify) before calling.
    *
    * Scale shape: ONE shuffle to the r×c contingency table; marginals
    * and the total come from the table itself (broadcast 1-row / r-row
    * relations), and the χ² grid is their r×c cross product so ABSENT
    * combinations contribute their (0 − exp)²/exp term too.
    *
    * Output: one row (n_rows_dim, n_cols_dim, n, chi2_milli, v).
    */
  def cramersV(orders: DataFrame): DataFrame =
    cramersVFromCells(orders.groupBy(col("o_orderpriority").as("a"),
        col("o_orderstatus").as("b"))
      .agg(count(lit(1)).as("nij")))

  /** Largest |n·nij − ra·cb| whose milli-quantized square still fits
    * DECIMAL(38,0): ⌊√((10³⁸−1)/10³)⌋ ≈ 3.16·10¹⁷ (integer Newton
    * sqrt, computed once). With |d| bounded by n²/4 on an associated
    * 2×2 this is the n ≈ 10⁹ headroom documented on [[cramersV]].
    */
  private[graft] val MaxAbsChiDiff: BigInt = {
    val target = (BigInt(10).pow(38) - 1) / 1000
    var x = BigInt(1) << (target.bitLength / 2 + 1)
    var y = (x + target / x) >> 1
    while (y < x) { x = y; y = (x + target / x) >> 1 }
    x
  }

  /** [[cramersV]] over a pre-aggregated contingency relation
    * (a, b, nij) — split out so the DECIMAL headroom guard is directly
    * testable with synthetic counts no fixture could reach.
    */
  private[graft] def cramersVFromCells(cells0: DataFrame): DataFrame = {
    val cells =
      graft.Caching.materialize(cells0) // feeds cells, both marginals, N
    val ra = cells.groupBy("a").agg(sum("nij").as("ra"))
    val cb = cells.groupBy("b").agg(sum("nij").as("cb"))
    val tot = cells.agg(sum("nij").as("n"),
      countDistinct("a").as("r"), countDistinct("b").as("c"))
    // χ² runs over the FULL r×c grid — absent combinations still
    // contribute (0 − exp)²/exp, so the grid is the marginal cross
    // product (r·c rows, a bounded domain) left-joined with the
    // observed cells
    val grid = graft.Caching.materialize(ra.crossJoin(cb)
      .join(cells, Seq("a", "b"), "left")
      .withColumn("nij", coalesce(col("nij"), lit(0L)))
      .crossJoin(broadcast(tot)))
    // loud DECIMAL(38,0) headroom guard: the grid is r×c rows, so the
    // extra action is O(r·c); without it an overflowed cell would
    // silently NULL out of the sum in non-ANSI mode
    val dmax = grid.agg(max(abs(col("n").cast(Dec) * col("nij") -
      col("ra").cast(Dec) * col("cb"))).as("dmax"))
      .head.getDecimal(0)
    require(dmax == null || BigInt(dmax.toBigInteger) <= MaxAbsChiDiff,
      s"cramersV: max |n*nij - ra*cb| = $dmax exceeds the DECIMAL(38,0) " +
        s"milli-chi2 headroom $MaxAbsChiDiff (~1e9 rows on an associated " +
        "2x2) - pre-aggregate, sample, or stratify the corpus first")
    grid
      .select(col("r"), col("c"), col("n"),
        // (n·obs − r·c)²·10³ div (r·c·n): exact DECIMAL core, one
        // truncating div per cell
        expr("""cast((cast(n as decimal(38,0)) * nij - cast(ra as decimal(38,0)) * cb)
               |     * (cast(n as decimal(38,0)) * nij - cast(ra as decimal(38,0)) * cb)
               |     * 1000
               |     div (cast(ra as decimal(38,0)) * cb * n) as long)"""
          .stripMargin.replace("\n", " ")).as("chi_milli"))
      .groupBy("r", "c", "n")
      .agg(sum(col("chi_milli")).as("chi2_milli"))
      .select(col("r").as("n_rows_dim"), col("c").as("n_cols_dim"), col("n"),
        col("chi2_milli"),
        fold6(sqrt(col("chi2_milli").cast("double") / 1e3 /
          (col("n").cast("double") *
            (least(col("r"), col("c")) - 1).cast("double")))).as("v"))
  }

  /** DuckDB replay of [[cramersV]] — identical rational core, HUGEINT
    * for the DECIMAL(38,0) products, `//` for the truncating div.
    */
  def cramersVOracleSql(): String =
    """WITH cells AS (
      |  SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS nij
      |  FROM orders GROUP BY 1, 2),
      |ra AS (SELECT a, SUM(nij) AS ra FROM cells GROUP BY 1),
      |cb AS (SELECT b, SUM(nij) AS cb FROM cells GROUP BY 1),
      |tot AS (
      |  SELECT SUM(nij) AS n, COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c
      |  FROM cells),
      |grid AS (
      |  SELECT a, b, ra, cb, COALESCE(nij, 0) AS nij
      |  FROM (SELECT * FROM ra CROSS JOIN cb)
      |  LEFT JOIN cells USING (a, b)),
      |scored AS (
      |  SELECT r, c, n,
      |         CAST((CAST(n AS HUGEINT) * nij - CAST(ra AS HUGEINT) * cb)
      |              * (CAST(n AS HUGEINT) * nij - CAST(ra AS HUGEINT) * cb)
      |              * 1000
      |              // (CAST(ra AS HUGEINT) * cb * n) AS BIGINT) AS chi_milli
      |  FROM grid CROSS JOIN tot)
      |SELECT CAST(r AS BIGINT) AS n_rows_dim, CAST(c AS BIGINT) AS n_cols_dim,
      |       CAST(n AS BIGINT) AS n,
      |       CAST(SUM(chi_milli) AS BIGINT) AS chi2_milli,
      |       FLOOR(SQRT(CAST(SUM(chi_milli) AS DOUBLE) / 1e3
      |                  / (CAST(n AS DOUBLE)
      |                     * CAST(LEAST(r, c) - 1 AS DOUBLE)))
      |             * 1e6 + 0.5) / 1e6 AS v
      |FROM scored GROUP BY r, c, n""".stripMargin

  // ----------------------------------------------------- XYZ classes

  /** XYZ demand-variability classification (the inventory-planning
    * companion to the shipped ABC Pareto classes; Schönsleben,
    * "Integral Logistics Management"): per part, the coefficient of
    * variation of monthly demand over the FULL corpus month span
    * (absent months count as zero demand), bucketed X (CV ≤ 0.5,
    * steady), Y (CV ≤ 1, fluctuating), Z (intermittent).
    *
    * Exactness: demand folds to integer quantity units; with
    * S₁ = Σ demand, S₂ = Σ demand² over the span of nM months,
    * CV² = (nM·S₂ − S₁²)/S₁², so the class thresholds become PURE
    * integer inequalities — X ⟺ 4·(nM·S₂ − S₁²) ≤ S₁², Y ⟺
    * (nM·S₂ − S₁²) ≤ S₁² — no float compares at bucket boundaries.
    * The reported cv2 is the one final folded double.
    *
    * Scale shape: one (part, month) hash agg, one part hash agg, one
    * broadcast 1-row month-span aggregate. Headroom: S₂ sums
    * quantity² per month — longs hold it to ~3·10⁹ units per
    * part-month; the DECIMAL(38,0) products are good past any real
    * corpus.
    *
    * Zero-demand guard: a part whose monthly quantities all round to
    * zero has S₁ = 0 — CV² is 0/0 there, and the raw integer
    * inequality 0 ≤ 0 would file the part under X ("steadiest"), the
    * opposite of its actual no-demand behavior. Both cv2 and the class
    * emit NULL for S₁ = 0, mirrored in the oracle.
    *
    * Output: one row per part
    * (part, n_active_months, s1, s2, cv2, xyz_class).
    */
  def xyzClass(lineitem: DataFrame): DataFrame = {
    val perMonth = lineitem
      .groupBy(col("l_partkey").as("part"),
        trunc(col("l_shipdate").cast("date"), "month").as("m"))
      .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("mq"))
    val span = lineitem.agg(
      (year(max(col("l_shipdate").cast("date"))) * 12 +
        month(max(col("l_shipdate").cast("date"))) -
        year(min(col("l_shipdate").cast("date"))) * 12 -
        month(min(col("l_shipdate").cast("date"))) + 1).cast("long").as("nm"))
    perMonth.groupBy("part")
      .agg(count(lit(1)).as("n_active_months"),
        sum(col("mq")).as("s1"),
        sum(col("mq") * col("mq")).as("s2"))
      .crossJoin(broadcast(span))
      .select(col("part"), col("n_active_months"), col("s1"), col("s2"),
        when(col("s1") === 0, lit(null).cast("double"))
          .otherwise(fold6((col("nm").cast(Dec) * col("s2") -
            col("s1").cast(Dec) * col("s1")).cast("double") /
            (col("s1").cast(Dec) * col("s1")).cast("double"))).as("cv2"),
        when(col("s1") === 0, lit(null).cast("string"))
          .when(col("nm").cast(Dec) * col("s2") * 4 - col("s1").cast(Dec) * col("s1") * 4
            <= col("s1").cast(Dec) * col("s1"), "X")
          .when(col("nm").cast(Dec) * col("s2") - col("s1").cast(Dec) * col("s1")
            <= col("s1").cast(Dec) * col("s1"), "Y")
          .otherwise("Z").as("xyz_class"))
  }

  /** DuckDB replay of [[xyzClass]] — the same integer inequalities
    * decide the class; HUGEINT mirrors DECIMAL(38,0).
    */
  def xyzClassOracleSql(): String =
    """WITH per_month AS (
      |  SELECT l_partkey AS part, date_trunc('month', l_shipdate) AS m,
      |         SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS mq
      |  FROM lineitem GROUP BY 1, 2),
      |span AS (
      |  SELECT CAST(year(MAX(l_shipdate)) * 12 + month(MAX(l_shipdate))
      |              - year(MIN(l_shipdate)) * 12 - month(MIN(l_shipdate))
      |              + 1 AS BIGINT) AS nm
      |  FROM lineitem),
      |agg AS (
      |  SELECT part, COUNT(*) AS n_active_months,
      |         SUM(mq) AS s1, SUM(mq * mq) AS s2
      |  FROM per_month GROUP BY 1)
      |SELECT part, CAST(n_active_months AS BIGINT) AS n_active_months,
      |       CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
      |       CASE WHEN s1 = 0 THEN NULL
      |            ELSE FLOOR(CAST(CAST(nm AS HUGEINT) * s2
      |                       - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
      |                  / CAST(CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
      |                  * 1e6 + 0.5) / 1e6 END AS cv2,
      |       CASE WHEN s1 = 0 THEN NULL
      |            WHEN CAST(nm AS HUGEINT) * s2 * 4
      |                 - CAST(s1 AS HUGEINT) * s1 * 4
      |                 <= CAST(s1 AS HUGEINT) * s1 THEN 'X'
      |            WHEN CAST(nm AS HUGEINT) * s2
      |                 - CAST(s1 AS HUGEINT) * s1
      |                 <= CAST(s1 AS HUGEINT) * s1 THEN 'Y'
      |            ELSE 'Z' END AS xyz_class
      |FROM agg CROSS JOIN span""".stripMargin

  // ---------------------------------------------------- Lorenz curve

  /** Lorenz concentration curve over customer revenue (Lorenz, JASA
    * 1905) — the decile curve POINTS behind the shipped Gini scalar:
    * customers sorted by revenue ascending, NTILE(10), cumulative
    * revenue share per decile ("the bottom 50% of customers carry 18%
    * of revenue").
    *
    * Scale shape: per-customer revenue is one hash agg; the global
    * NTILE uses [[graft.operators.GlobalRank.ntileByRange]] — range
    * repartition + per-partition numbering, NO data-sized single
    * window partition; the cumulative window then runs over the 10
    * decile rows (bounded domain). Ties broken by customer key, so the
    * tile assignment is a total order and replays exactly.
    *
    * Output: 10 rows (decile, n_customers, decile_cents, cum_cents,
    * cum_share) — cum_share the one final folded division.
    */
  def lorenzCurve(orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev"))
    val tiled = graft.operators.GlobalRank.ntileByRange(
      perCust, 10, Seq("rev", "o_custkey"), "decile")
    val deciles = tiled.groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("rev").as("decile_cents"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = deciles.agg(sum("decile_cents").as("total_cents"))
    deciles
      .withColumn("cum_cents", sum(col("decile_cents")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_customers"), col("decile_cents"),
        col("cum_cents"),
        fold6(col("cum_cents").cast("double") /
          col("total_cents").cast("double")).as("cum_share"))
  }

  /** DuckDB replay of [[lorenzCurve]]: plain NTILE over the identical
    * (rev, custkey) total order — [[lorenzCurve]]'s range NTILE is
    * defined to match SQL NTILE bucket-for-bucket.
    */
  def lorenzCurveOracleSql(): String =
    """WITH per_cust AS (
      |  SELECT o_custkey,
      |         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
      |  FROM orders GROUP BY 1),
      |tiled AS (
      |  SELECT rev, NTILE(10) OVER (ORDER BY rev, o_custkey) AS decile
      |  FROM per_cust),
      |deciles AS (
      |  SELECT decile, COUNT(*) AS n_customers, SUM(rev) AS decile_cents
      |  FROM tiled GROUP BY 1),
      |curve AS (
      |  SELECT decile, n_customers, decile_cents,
      |         SUM(decile_cents) OVER (ORDER BY decile
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
      |         (SELECT SUM(decile_cents) FROM deciles) AS total_cents
      |  FROM deciles)
      |SELECT CAST(decile AS INT) AS decile,
      |       CAST(n_customers AS BIGINT) AS n_customers,
      |       CAST(decile_cents AS BIGINT) AS decile_cents,
      |       CAST(cum_cents AS BIGINT) AS cum_cents,
      |       FLOOR(CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
      |             * 1e6 + 0.5) / 1e6 AS cum_share
      |FROM curve""".stripMargin

  // ---------------------------------------------- rolling regression

  /** 12-month rolling OLS trend per order priority: slope and
    * intercept of revenue-vs-month over a sliding ROWS window — the
    * windowed companion to the global `q_trend_slope` (is the trend
    * accelerating LATELY?).
    *
    * Exactness: x is the month serial (year·12+month, a small long),
    * y exact cents; the five window sums (n, Σx, Σy, Σxy, Σx²) are
    * exact DECIMAL(38,0); slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and
    * intercept = (ΣyΣx² − ΣxΣxy)/(nΣx² − (Σx)²) emit as
    * INTEGER-quantized exact values (micro-cents/month for the slope,
    * milli-cents for the intercept) via one truncating DECIMAL
    * division each — no doubles at all: at corpus scale the intercept
    * is ~10¹³ cents, where a 1e-6 float fold exceeds 2⁵³ and stops
    * being replayable, so this family stays integer end-to-end
    * ([[Breadth6.theilSenSlope]] discipline). Headroom: num·10⁶ for
    * the slope peaks ~10²³ at a 100 TB corpus — DECIMAL(38,0) holds
    * it; intercept_milli fits a signed long to ~9·10¹⁵ cents
    * (~$10¹⁴ of monthly revenue). den = 0 at the first row of each
    * series → NULL, mirrored.
    *
    * Windows are PARTITIONED by priority and bounded by the month
    * domain — no data-sized window partition.
    *
    * Output: (o_orderpriority, month_start, n, slope_micro,
    * intercept_milli).
    */
  def rollingRegression(orders: DataFrame, months: Int = 12): DataFrame = {
    require(months >= 2 && months <= 120, "window must be in [2, 120] months")
    val monthly = orders
      .groupBy(col("o_orderpriority"),
        trunc(col("o_orderdate").cast("date"), "month").as("month_start"))
      .agg(sum(cents(col("o_totalprice"))).as("y"))
      .select(col("o_orderpriority"), col("month_start"),
        (year(col("month_start")) * 12 + month(col("month_start")))
          .cast("long").as("x"), col("y"))
    val w = Window.partitionBy("o_orderpriority").orderBy("month_start")
      .rowsBetween(-(months - 1), Window.currentRow)
    val den = col("n").cast(Dec) * col("sxx") - col("sx").cast(Dec) * col("sx")
    monthly
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x").cast(Dec) * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .select(col("o_orderpriority"), col("month_start"), col("n"),
        when(den === 0, lit(null).cast("long"))
          .otherwise(expr(
            """cast(((cast(n as decimal(38,0)) * sxy
              |  - cast(sx as decimal(38,0)) * sy) * 1000000)
              |  div (cast(n as decimal(38,0)) * sxx
              |  - cast(sx as decimal(38,0)) * sx) as long)"""
              .stripMargin.replace("\n", " "))).as("slope_micro"),
        when(den === 0, lit(null).cast("long"))
          .otherwise(expr(
            """cast(((cast(sy as decimal(38,0)) * sxx
              |  - cast(sx as decimal(38,0)) * sxy) * 1000)
              |  div (cast(n as decimal(38,0)) * sxx
              |  - cast(sx as decimal(38,0)) * sx) as long)"""
              .stripMargin.replace("\n", " "))).as("intercept_milli"))
  }

  /** DuckDB replay of [[rollingRegression]] — identical window frames
    * and truncating `//` divisions; HUGEINT for the exact core.
    */
  def rollingRegressionOracleSql(months: Int = 12): String = {
    val frame = s"ROWS BETWEEN ${months - 1} PRECEDING AND CURRENT ROW"
    s"""WITH monthly AS (
       |  SELECT o_orderpriority,
       |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       |         CAST(year(date_trunc('month', o_orderdate)) * 12
       |              + month(date_trunc('month', o_orderdate)) AS BIGINT) AS x,
       |         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
       |  FROM orders GROUP BY 1, 2, 3),
       |sums AS (
       |  SELECT o_orderpriority, month_start,
       |         COUNT(*) OVER wf AS n,
       |         SUM(x) OVER wf AS sx,
       |         SUM(y) OVER wf AS sy,
       |         SUM(CAST(x AS HUGEINT) * y) OVER wf AS sxy,
       |         SUM(x * x) OVER wf AS sxx
       |  FROM monthly
       |  WINDOW wf AS (PARTITION BY o_orderpriority ORDER BY month_start
       |                $frame))
       |SELECT o_orderpriority, month_start, CAST(n AS BIGINT) AS n,
       |       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0
       |            THEN NULL
       |            ELSE CAST(((CAST(n AS HUGEINT) * sxy
       |                        - CAST(sx AS HUGEINT) * sy) * 1000000)
       |                      // (CAST(n AS HUGEINT) * sxx
       |                          - CAST(sx AS HUGEINT) * sx) AS BIGINT)
       |            END AS slope_micro,
       |       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0
       |            THEN NULL
       |            ELSE CAST(((CAST(sy AS HUGEINT) * sxx
       |                        - CAST(sx AS HUGEINT) * sxy) * 1000)
       |                      // (CAST(n AS HUGEINT) * sxx
       |                          - CAST(sx AS HUGEINT) * sx) AS BIGINT)
       |            END AS intercept_milli
       |FROM sums""".stripMargin
  }
}
