package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift statistics between corpus slices.
  *
  * [[ksDrift]] is the exact two-sample Kolmogorov–Smirnov statistic
  * D = sup_x |F_A(x) − F_B(x)| over a numeric document feature — the
  * standard "did this crawl's length distribution shift?" monitor a
  * training-data pipeline runs between snapshots or sources.
  *
  * Exactness discipline: the supremum is selected on the INTEGER
  * cross-multiplied numerator |cumA·nB − cumB·nA| (exact DECIMAL(38,0)
  * products — long·long overflows past ~3·10⁹ rows per side), and only
  * the final winning value is divided and rounded, so both engines pick
  * the same argmax and emit the same double.
  *
  * Scale shape: one groupBy on the feature value collapses the corpus to
  * its distinct-value domain (thousands of distinct lengths, independent
  * of corpus size); the cumulative sums then run over that bounded
  * domain. Same bounded-domain window rationale as Skyline/GlobalRank —
  * for an unbounded-domain feature, range-partition the domain and use
  * Packing.withRunningTotal's two-pass prefix instead.
  */
object Drift {

  private val Dec = DecimalType(19, 0)

  /** KS statistic of `featureCol` between two halves of the corpus split
    * by even/odd numeric suffix of `source` (srcN). Returns one row:
    * (n_a, n_b, ks_at, ks_stat) where ks_at is the smallest feature
    * value attaining the supremum.
    */
  /** CUSUM change-point detection over the daily revenue series: the
    * day t maximizing |n·C_t − t·T| (C_t = prefix sum, T = total) — the
    * scaled-by-n form of the classic cumulative-sum deviation
    * sup|C_t − t·T/n| (Page, "Continuous Inspection Schemes",
    * Biometrika 1954), kept in pure integer cents so both engines pick
    * the identical argmax (ties → earliest day). This is the "when did
    * the level shift?" monitor that pairs with [[ksDrift]]'s "did the
    * distribution shift?".
    *
    * Scale shape: the corpus collapses to the day-count-bounded daily
    * aggregate first (one shuffle of per-day partials); the cumulative
    * window and row index run over that bounded domain (Skyline/
    * GlobalRank rationale), the 1-row totals broadcast, and the argmax
    * is a TakeOrderedAndProject. Headroom: n_days·T_cents must fit 63
    * bits — ~9e18 covers 10⁴ days at $10¹² total.
    *
    * Output: one row (cp_day, n_days, max_abs_dev).
    */
  def cusumChangepoint(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
        .cast("long").as("cents"))
    val totals = daily.agg(sum(col("cents")).as("t_cents"),
      count(lit(1)).as("n_days"))
    val w = Window.orderBy("day")
    daily
      .select(col("day"),
        sum(col("cents")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("cum"),
        row_number().over(w).as("i"))
      .crossJoin(broadcast(totals))
      .select(col("day"), col("n_days"),
        (col("n_days") * col("cum") - col("i") * col("t_cents")).as("dev"))
      .orderBy(abs(col("dev")).desc, col("day").asc)
      .limit(1)
      .select(col("day").as("cp_day"), col("n_days"),
        abs(col("dev")).as("max_abs_dev"))
  }

  /** Classical seasonal decomposition of the monthly revenue series:
    * x = trend + seasonal + residual, with trend a centered 3-month
    * moving average and seasonal the per-calendar-month mean of the
    * detrended series (the additive moving-average decomposition
    * underlying STL, without STL's loess).
    *
    * Exactness discipline: revenue is integer cents; the MA is kept as
    * (sum, count) with count ∈ {2, 3}; the detrended value scales by 6
    * (the lcm, via integer `div`) so it stays an exact long through the
    * per-month aggregation; trend/seasonal/residual are then single
    * fixed-shape double expressions of exact integers, each rounded to
    * 1e-6 — both engines emit identical rows.
    *
    * Scale shape: the corpus collapses to the month-count-bounded
    * monthly aggregate in one shuffle; windows and the calendar-month
    * agg run over that bounded domain (Skyline/GlobalRank rationale).
    *
    * Output: (month_start, revenue_cents, trend, seasonal, residual).
    */
  def seasonalDecompose(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(trunc(col("o_orderdate").cast("date"), "month").as("month_start"))
      .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
        .cast("long").as("x"))
    val w = Window.orderBy("month_start").rowsBetween(-1, 1)
    val ma = monthly
      .select(col("month_start"), col("x"),
        sum(col("x")).over(w).as("s"), count(lit(1)).over(w).as("c"))
      .withColumn("moy", month(col("month_start")))
      // detrended ×6: 6x − (6 div c)·s is exact (c ∈ {2,3} divides 6)
      .withColumn("d6", lit(6) * col("x") - expr("6 div c") * col("s"))
    val seasonal = ma.groupBy("moy")
      .agg(sum(col("d6")).as("s6"), count(lit(1)).as("k"))
    // floor(x·1e6 + 0.5)/1e6 instead of round(): round() is HALF_UP on
    // the DECIMAL REPRESENTATION in Spark but pure double arithmetic in
    // DuckDB — 1 ulp apart on knife-edge values; the floor fold is the
    // same double ops on both engines
    def fold6(c: org.apache.spark.sql.Column) =
      floor(c * 1e6 + 0.5) / 1e6
    ma.join(broadcast(seasonal), "moy")
      .select(col("month_start"), col("x").as("revenue_cents"),
        fold6(col("s").cast("double") / col("c")).as("trend"),
        fold6(col("s6").cast("double") / (lit(6.0) * col("k"))).as("seasonal"),
        fold6(col("x").cast("double") - col("s").cast("double") / col("c")
          - col("s6").cast("double") / (lit(6.0) * col("k"))).as("residual"))
  }

  def ksDrift(documents: DataFrame, featureCol: String = "n_chars"): DataFrame = {
    val g = documents.select(
      col(featureCol).as("x"),
      (expr("CAST(substring(source, 4) AS INT)") % 2 === 0).as("is_a"))
    val counts = g.groupBy("x").agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    counts.count() // materialize once: the window branch and the totals
                   // branch would otherwise each re-scan the corpus
    // bounded domain: one row per distinct feature value
    val w = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.select(col("x"),
      sum("ca").over(w).as("cuma"), sum("cb").over(w).as("cumb"))
    // totals from the pre-window counts — the final cumulative values,
    // without dragging a second window evaluation into the plan
    val tot = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val scored = cum.crossJoin(broadcast(tot))
      .withColumn("d_num",
        abs(col("cuma").cast(Dec) * col("nb").cast(Dec) -
            col("cumb").cast(Dec) * col("na").cast(Dec)))
    scored.orderBy(desc("d_num"), asc("x")).limit(1)
      .select(
        col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        col("x").as("ks_at"),
        round(col("d_num").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")), 6).as("ks_stat"))
  }
}
