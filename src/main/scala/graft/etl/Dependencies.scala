package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency discovery over a fixed candidate column list —
  * the single-LHS slice of TANE (Huhtala et al., The Computer Journal
  * 42(2), 1999): X → Y holds iff every value of X co-occurs with exactly
  * one value of Y. Warehouses run this to find undeclared constraints
  * (surrogate-key candidates, denormalization opportunities, dims hiding
  * inside fact columns) before modeling; profiling suites (Metanome,
  * deequ) ship the same check.
  *
  * Mechanics: each row fans out to the k·(k−1) ordered column pairs as
  * (lhs, rhs, lhs_val, rhs_val) string tuples (NULL folded to a sentinel
  * so it behaves as a value — SQL's COUNT(DISTINCT) would silently drop
  * it); one hash-agg computes distinct-RHS per (pair, lhs_val); a second
  * counts groups and violations. X → Y holds when no LHS value maps to
  * more than one RHS value.
  *
  * Scale shape: one scan, a constant k·(k−1) row fan-out (k is the
  * candidate list, 5 here — not the table width of an arbitrary 100 TB
  * fact), and two keyed hash aggregations, the first partially
  * aggregated map-side. Nothing driver-side, no joins. For wide tables
  * the candidate list is the knob: profiling runs pick the columns worth
  * testing, exactly as TANE prunes its lattice.
  */
object Dependencies {

  private val NullSentinel = "<null>"

  /** All single-column FDs among `cols`.
    *
    * Output: (lhs, rhs, n_groups, n_violating, holds) — `n_groups` is
    * the number of distinct LHS values, `n_violating` how many of them
    * map to >1 RHS value, `holds` whether the FD is exact.
    */
  def functionalDeps(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two candidate columns")
    require(cols.distinct.size == cols.size, "candidate columns must be distinct")
    val pairs = for {
      l <- cols; r <- cols if l != r
    } yield struct(lit(l).as("lhs"), lit(r).as("rhs"),
      coalesce(col(l).cast("string"), lit(NullSentinel)).as("lv"),
      coalesce(col(r).cast("string"), lit(NullSentinel)).as("rv"))
    df.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.lhs"), col("p.rhs"), col("p.lv"), col("p.rv"))
      .groupBy("lhs", "rhs", "lv")
      .agg(countDistinct(col("rv")).as("n_rhs"))
      .groupBy("lhs", "rhs")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"))
      .select(col("lhs"), col("rhs"), col("n_groups"), col("n_violating"),
        (col("n_violating") === 0L).as("holds"))
  }

  /** DuckDB replay of [[functionalDeps]]: one UNION ALL branch per
    * ordered pair, identical NULL sentinel and distinct-count shape.
    */
  def functionalDepsOracleSql(table: String, cols: Seq[String]): String = {
    val branches = for {
      l <- cols; r <- cols if l != r
    } yield
      s"""SELECT '$l' AS lhs, '$r' AS rhs,
         |       CAST(COUNT(*) AS BIGINT) AS n_groups,
         |       CAST(COUNT(CASE WHEN n_rhs > 1 THEN 1 END) AS BIGINT) AS n_violating,
         |       COUNT(CASE WHEN n_rhs > 1 THEN 1 END) = 0 AS holds
         |FROM (SELECT COALESCE(CAST($l AS VARCHAR), '$NullSentinel') AS lv,
         |             COUNT(DISTINCT COALESCE(CAST($r AS VARCHAR), '$NullSentinel')) AS n_rhs
         |      FROM $table GROUP BY 1)""".stripMargin
    branches.mkString("\nUNION ALL\n")
  }
}
