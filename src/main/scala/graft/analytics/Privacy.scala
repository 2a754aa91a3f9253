package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** t-closeness audit (Li, Li & Venkatasubramanian, "t-Closeness:
  * Privacy Beyond k-Anonymity and l-Diversity", ICDE 2007) — the third
  * rung of the release-audit ladder the library already ships
  * (`q_kanon` class sizes, `q_ldiversity` distinct sensitive values):
  * a class can be k-anonymous AND l-diverse while its sensitive-value
  * DISTRIBUTION still leaks (19 of 20 members in the top income decile
  * says plenty). t-closeness bounds the Earth Mover's Distance between
  * each equivalence class's sensitive distribution and the global one.
  *
  * For an ORDERED sensitive attribute over B equal-width bins the EMD
  * has the closed form Σ_b |F_class(b) − F_global(b)| / (B−1) (ordered
  * EMD = area between the CDFs, normalized by the maximum transport).
  *
  * Exactness discipline: the CDF difference is the integer numerator
  * |cum_c·N − cum_g·n_c| (DECIMAL(38,0) — long·long overflows past
  * ~3e9 rows), summed exactly per class; ONE final division and a
  * 1e-6 floor-fold make the result bit-identical on any engine.
  *
  * 100 TB shape: the corpus collapses to (class × bin) counts in one
  * map-side-combined shuffle; the bin spine join and both cumulative
  * windows run on that bounded relation (bins are a constant; classes
  * are the QI domain — window partitions are B rows each, never
  * data-sized). The 1-row global bounds and B-row global CDF
  * broadcast.
  */
object Privacy {

  /** Per-class t-closeness of the account-balance decile distribution
    * over quasi-identifier classes (c_nationkey, c_mktsegment).
    * Output: (c_nationkey, c_mktsegment, class_size, t_close), t in
    * [0,1] folded to 1e-6.
    */
  def tCloseness(customer: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least two bins")
    val dec = DecimalType(38, 0)
    val g = customer.select(col("c_nationkey"), col("c_mktsegment"),
      col("c_acctbal").cast("double").as("x"))
    val bounds = g.agg(min("x").as("lo"), max("x").as("hi"))
    val binned = g.crossJoin(broadcast(bounds))
      .select(col("c_nationkey"), col("c_mktsegment"),
        when(col("hi") === col("lo"), 0)
          .otherwise(least(floor((col("x") - col("lo")) /
            ((col("hi") - col("lo")) / bins)), lit(bins - 1)))
          .cast("int").as("bin"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    binned.count() // class counts AND global counts read this relation
    val classCnt = binned.groupBy("c_nationkey", "c_mktsegment", "bin")
      .agg(count(lit(1)).as("c"))
    // spine: every (class, bin) cell, so empty bins carry an explicit 0
    // through the cumulative sums
    val spine = binned.select("c_nationkey", "c_mktsegment").distinct()
      .crossJoin(binned.sparkSession.range(bins.toLong)
        .select(col("id").cast("int").as("bin")))
    val full = spine.join(classCnt, Seq("c_nationkey", "c_mktsegment", "bin"),
        "left")
      .select(col("c_nationkey"), col("c_mktsegment"), col("bin"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wc = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // full-frame sibling window: the class total n_c on every row (the
    // partition is B rows, so the second frame is free)
    val wcf = Window.partitionBy("c_nationkey", "c_mktsegment")
    val classCum = full.select(col("c_nationkey"), col("c_mktsegment"),
      col("bin"), sum("c").over(wc).as("cum_c"), sum("c").over(wcf).as("n_c"))
    // global CDF over the same spine: B rows, broadcastable
    val globalCnt = binned.groupBy("bin").agg(count(lit(1)).as("gc"))
    val globalSpine = binned.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("bin"))
      .join(globalCnt, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("gc"), lit(0L)).as("gc"))
    val wg = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val globalCum = globalSpine.select(col("bin"),
      sum("gc").over(wg).as("cum_g"))
    val tot = binned.agg(count(lit(1)).as("n_total"))
    classCum.join(broadcast(globalCum), "bin")
      .crossJoin(broadcast(tot))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(
        max(col("n_c")).as("class_size"),
        sum(abs(col("cum_c").cast(dec) * col("n_total").cast(dec) -
                col("cum_g").cast(dec) * col("n_c").cast(dec))).as("num"),
        max(col("n_total")).as("n_total"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        col("class_size").cast("long").as("class_size"),
        (floor(col("num").cast("double") /
          (col("class_size").cast("double") * col("n_total").cast("double") *
            (bins - 1)) * 1e6 + 0.5) / 1e6).as("t_close"))
  }

  /** DuckDB replay of [[tCloseness]]: same spine, HUGEINT CDF-difference
    * numerators, one shared division + fold.
    */
  def tClosenessOracleSql(bins: Int = 10): String =
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS x
       |  FROM customer),
       |bounds AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM g),
       |binned AS (
       |  SELECT c_nationkey, c_mktsegment,
       |         CAST(CASE WHEN hi = lo THEN 0
       |              ELSE LEAST(FLOOR((x - lo) / ((hi - lo) / $bins)), ${bins - 1})
       |              END AS INTEGER) AS bin
       |  FROM g CROSS JOIN bounds),
       |classes AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM binned),
       |spine AS (
       |  SELECT c_nationkey, c_mktsegment, CAST(range AS INTEGER) AS bin
       |  FROM classes CROSS JOIN range($bins)),
       |cc AS (
       |  SELECT c_nationkey, c_mktsegment, bin, COUNT(*) AS c
       |  FROM binned GROUP BY 1, 2, 3),
       |cells AS (
       |  SELECT s.c_nationkey, s.c_mktsegment, s.bin, COALESCE(cc.c, 0) AS c
       |  FROM spine s LEFT JOIN cc
       |    ON cc.c_nationkey = s.c_nationkey
       |   AND cc.c_mktsegment = s.c_mktsegment AND cc.bin = s.bin),
       |cum AS (
       |  SELECT c_nationkey, c_mktsegment, bin,
       |         SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment
       |                      ORDER BY bin) AS cum_c,
       |         SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n_c
       |  FROM cells),
       |gb AS (SELECT bin, COUNT(*) AS gc FROM binned GROUP BY 1),
       |gcum AS (
       |  SELECT s.bin,
       |         SUM(COALESCE(gb.gc, 0)) OVER (ORDER BY s.bin) AS cum_g
       |  FROM (SELECT CAST(range AS INTEGER) AS bin FROM range($bins)) s
       |  LEFT JOIN gb ON gb.bin = s.bin),
       |tot AS (SELECT COUNT(*) AS n_total FROM binned)
       |SELECT c.c_nationkey, c.c_mktsegment,
       |       CAST(MAX(n_c) AS BIGINT) AS class_size,
       |       FLOOR(CAST(SUM(ABS(CAST(cum_c AS HUGEINT) * n_total
       |                          - CAST(cum_g AS HUGEINT) * n_c)) AS DOUBLE)
       |             / (CAST(MAX(n_c) AS DOUBLE) * CAST(MAX(n_total) AS DOUBLE)
       |                * ${bins - 1}) * 1e6 + 0.5) / 1e6 AS t_close
       |FROM cum c JOIN gcum ON gcum.bin = c.bin CROSS JOIN tot
       |GROUP BY 1, 2""".stripMargin

  /** ε-differentially-private histogram release (Dwork, McSherry,
    * Nissim & Smith, TCC 2006: the Laplace mechanism) — the fourth rung
    * of the release ladder: instead of AUDITING a release (k-anon /
    * l-div / t-close), PERTURB it. Per-group counts have L1 sensitivity
    * 1 (one customer moves one count by one), so adding Laplace(1/ε)
    * noise to every count is ε-DP.
    *
    * The noise draw must be deterministic to be oracle-checkable, so the
    * uniform comes from the md5 integerization both engines share
    * ([[graft.operators.Sampling]]'s scheme): u = (h + 0.5)/2²⁰ − 0.5
    * over the group key and a fixed seed (h = 60-bit md5 prefix mod 2²⁰;
    * the +0.5 centers the lattice so |u| < 0.5 exactly and the inverse
    * CDF never sees its poles), then the standard inverse-CDF transform
    * noise = −(1/ε)·sign(u)·ln(1 − 2|u|). One production caveat is
    * documented rather than hidden: a keyed hash is a PSEUDO-random
    * draw — swap in a CSPRNG stream for a real privacy deployment; the
    * mechanism, sensitivity argument and plumbing are unchanged.
    *
    * Exactness: ln() is quantized ONCE to micro-longs per group; the
    * released value is (true_count·10⁶ + noise_micro)/10⁶, a single
    * exact integer add and one final division.
    *
    * 100 TB shape: one map-side-combined count shuffle to the group
    * domain, then row-local hashing and arithmetic on the (small) group
    * relation. No joins, no driver state.
    */
  def dpNoisyCounts(customer: DataFrame, epsilon: Double = 1.0,
                    seed: Int = 42): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val counts = customer.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_true"))
    val h = pmod(
      conv(substring(md5(concat(lit(s"dp:$seed:"), col("c_nationkey").cast("string"),
        lit("|"), col("c_mktsegment"))), 1, 15), 16, 10).cast("long"),
      lit(1048576L))
    val u = (h.cast("double") + 0.5) / 1048576.0 - 0.5
    val noiseMicro = floor(
      (-lit(1.0 / epsilon)) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
        * 1.0e6 + 0.5).cast("long")
    counts.select(col("c_nationkey"), col("c_mktsegment"),
      ((col("n_true") * 1000000L + noiseMicro).cast("double") / 1.0e6)
        .as("noisy_count"),
      lit(epsilon).as("epsilon"))
  }

  /** DuckDB replay of [[dpNoisyCounts]]: identical md5 lattice uniform,
    * inverse-CDF Laplace, single micro-quantization point.
    */
  def dpNoisyCountsOracleSql(epsilon: Double = 1.0, seed: Int = 42): String =
    s"""WITH counts AS (
       |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_true
       |  FROM customer GROUP BY 1, 2),
       |drawn AS (
       |  SELECT c_nationkey, c_mktsegment, n_true,
       |         (CAST(('0x' || substring(md5('dp:$seed:' || CAST(c_nationkey AS VARCHAR)
       |            || '|' || c_mktsegment), 1, 15))::BIGINT % 1048576 AS DOUBLE)
       |          + 0.5) / 1048576.0 - 0.5 AS u
       |  FROM counts)
       |SELECT c_nationkey, c_mktsegment,
       |       CAST(n_true * 1000000 +
       |            CAST(floor((CAST(-1 AS DOUBLE) / CAST($epsilon AS DOUBLE))
       |                       * sign(u) * ln(1.0 - 2.0 * abs(u))
       |                       * 1e6 + 0.5) AS BIGINT) AS DOUBLE) / 1e6 AS noisy_count,
       |       CAST($epsilon AS DOUBLE) AS epsilon
       |FROM drawn""".stripMargin
}
