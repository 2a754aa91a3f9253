package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form two-regressor ordinary least squares via exact power
  * sums — the distributed "fit a plane through 10¹² points" primitive
  * (price ~ quantity + discount here; the same normal-equations shape
  * underlies feature calibration and trend attribution in any pipeline
  * where the model is small and the data is not).
  *
  * Why closed-form: with p = 2 regressors the normal equations are a
  * 2×2 Cramer solve of TEN scalar power sums — one aggregation pass, no
  * iteration, no gradient state. `regr_slope`-style streaming float
  * moments would drift by partition order; instead every sum is an
  * exact integer (inputs fold to fixed-point cents/centi-units first,
  * the q_trend_slope discipline), accumulated as DECIMAL(38,0), and the
  * coefficients are ONE fixed IEEE expression of those exact sums —
  * bit-identical on any engine at any parallelism.
  *
  * 100 TB shape: a single map + partial-agg pass (map-side combine
  * collapses each task to one 10-field row); the driver-side math is a
  * 1-row select. Nothing shuffles but 10 numbers per task. Headroom:
  * Σy² at cents scale is ~10¹⁸ per 10¹² rows — DECIMAL(38,0) holds
  * 10³⁸, twenty orders past any real corpus.
  */
object Ols {

  /** Fit l_extendedprice ($ cents) ~ b0 + b1·l_quantity + b2·l_discount
    * over lineitem. Output: one row (n, b0, b1, b2, r2) in dollar
    * units, each coefficient folded to 1e-6 (floor(x·1e6 + 0.5)/1e6 —
    * the repo's cross-engine double discipline).
    */
  def priceModel(lineitem: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    // fixed-point integer inputs: quantity units, centi-discount, cents
    val staged = lineitem.select(
      floor(col("l_quantity")).cast("long").as("q"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("dc"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("yc"))
    val sums = staged.agg(
      count(lit(1)).as("n"),
      sum(col("q").cast(dec)).as("s1"),
      sum(col("dc").cast(dec)).as("s2"),
      sum(col("yc").cast(dec)).as("sy"),
      sum((col("q") * col("q")).cast(dec)).as("s11"),
      sum((col("q") * col("dc")).cast(dec)).as("s12"),
      sum((col("dc") * col("dc")).cast(dec)).as("s22"),
      sum((col("q") * col("yc")).cast(dec)).as("s1y"),
      sum((col("dc") * col("yc")).cast(dec)).as("s2y"),
      sum((col("yc") * col("yc")).cast(dec)).as("syy"))
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double"); val s2 = col("s2").cast("double")
    val sy = col("sy").cast("double")
    val s11 = col("s11").cast("double"); val s12 = col("s12").cast("double")
    val s22 = col("s22").cast("double")
    val s1y = col("s1y").cast("double"); val s2y = col("s2y").cast("double")
    val syy = col("syy").cast("double")
    val m11 = n * s11 - s1 * s1
    val m12 = n * s12 - s1 * s2
    val m22 = n * s22 - s2 * s2
    val v1 = n * s1y - s1 * sy
    val v2 = n * s2y - s2 * sy
    val det = m11 * m22 - m12 * m12
    // coefficients in SCALED units (y cents, x2 centi-discount)
    val b1s = (m22 * v1 - m12 * v2) / det
    val b2s = (m11 * v2 - m12 * v1) / det
    val b0s = (sy - b1s * s1 - b2s * s2) / n
    val r2 = (b1s * v1 + b2s * v2) / (n * syy - sy * sy)
    def fold6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
    sums.select(
      col("n").cast("long").as("n"),
      // unscale: cents -> dollars; centi-discount cancels the cents
      fold6(b0s / 100.0).as("b0"),
      fold6(b1s / 100.0).as("b1"),
      fold6(b2s).as("b2"),
      fold6(r2).as("r2"))
  }

  /** DuckDB replay: identical fixed-point staging, HUGEINT power sums,
    * and the same IEEE expression tree.
    */
  val priceModelOracleSql: String =
    """WITH staged AS (
      |  SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
      |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc,
      |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS yc
      |  FROM lineitem),
      |s AS (
      |  SELECT COUNT(*) AS n,
      |         SUM(CAST(q AS HUGEINT)) AS s1,
      |         SUM(CAST(dc AS HUGEINT)) AS s2,
      |         SUM(CAST(yc AS HUGEINT)) AS sy,
      |         SUM(CAST(q AS HUGEINT) * q) AS s11,
      |         SUM(CAST(q AS HUGEINT) * dc) AS s12,
      |         SUM(CAST(dc AS HUGEINT) * dc) AS s22,
      |         SUM(CAST(q AS HUGEINT) * yc) AS s1y,
      |         SUM(CAST(dc AS HUGEINT) * yc) AS s2y,
      |         SUM(CAST(yc AS HUGEINT) * yc) AS syy
      |  FROM staged),
      |d AS (
      |  SELECT n,
      |         CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
      |         CAST(s2 AS DOUBLE) AS s2d, CAST(sy AS DOUBLE) AS syd,
      |         CAST(s11 AS DOUBLE) AS s11d, CAST(s12 AS DOUBLE) AS s12d,
      |         CAST(s22 AS DOUBLE) AS s22d, CAST(s1y AS DOUBLE) AS s1yd,
      |         CAST(s2y AS DOUBLE) AS s2yd, CAST(syy AS DOUBLE) AS syyd
      |  FROM s),
      |m AS (
      |  SELECT n, nd, s1d, s2d, syd, syyd,
      |         nd * s11d - s1d * s1d AS m11,
      |         nd * s12d - s1d * s2d AS m12,
      |         nd * s22d - s2d * s2d AS m22,
      |         nd * s1yd - s1d * syd AS v1,
      |         nd * s2yd - s2d * syd AS v2
      |  FROM d),
      |c AS (
      |  SELECT n, nd, s1d, s2d, syd, syyd, v1, v2,
      |         (m22 * v1 - m12 * v2) / (m11 * m22 - m12 * m12) AS b1s,
      |         (m11 * v2 - m12 * v1) / (m11 * m22 - m12 * m12) AS b2s
      |  FROM m)
      |SELECT CAST(n AS BIGINT) AS n,
      |       floor(((syd - b1s * s1d - b2s * s2d) / nd) / 100.0 * 1e6 + 0.5) / 1e6 AS b0,
      |       floor(b1s / 100.0 * 1e6 + 0.5) / 1e6 AS b1,
      |       floor(b2s * 1e6 + 0.5) / 1e6 AS b2,
      |       floor((b1s * v1 + b2s * v2) / (nd * syyd - syd * syd) * 1e6 + 0.5) / 1e6 AS r2
      |FROM c""".stripMargin
}
