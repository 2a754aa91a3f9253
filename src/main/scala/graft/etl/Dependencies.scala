package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Majority-vote repair of a NEAR-functional dependency — the
    * data-cleaning step FD discovery feeds (the core move of
    * HoloClean/Bohannon-style constraint repair, stated minimally):
    * when X→Y holds for ≥ `minAgreementPct`% of each X-group, rows
    * carrying a minority Y value are flagged as suspected errors with
    * the group majority as the suggested fix.
    *
    * Exactness: the agreement gate is the INTEGER comparison
    * n_majority·100 ≥ n_rows·minAgreementPct — no doubles anywhere;
    * majority ties break on RHS value ascending, so the suggestion is
    * deterministic.
    *
    * Scale shape: one hash-agg to (lhs, rhs) counts, a per-lhs
    * majority window over the distinct-RHS relation (group width = the
    * RHS domain per key, not the row count), and one keyed join back
    * to flag suspect rows. All shuffles keyed on lhs.
    *
    * Output: (id, lhs_val, bad_rhs, suggested_rhs, n_rows, n_majority)
    * — one row per suspected-error source row.
    */
  def majorityRepair(df: DataFrame, idCol: String, lhsCol: String,
                     rhsCol: String, minSupport: Int = 4,
                     minAgreementPct: Int = 90): DataFrame = {
    require(minSupport >= 2, "need at least two rows per group")
    require(minAgreementPct > 50 && minAgreementPct <= 100,
      "majority needs agreement in (50, 100]")
    val counts = df.groupBy(col(lhsCol).as("lhs_val"), col(rhsCol).as("rhs_val"))
      .agg(count(lit(1)).as("n_rhs"))
    val wMaj = Window.partitionBy("lhs_val")
      .orderBy(col("n_rhs").desc, col("rhs_val").asc)
    val groups = counts
      .withColumn("rk", row_number().over(wMaj))
      .withColumn("n_rows", sum(col("n_rhs")).over(Window.partitionBy("lhs_val")))
      .filter(col("rk") === 1)
      .filter(col("n_rows") >= minSupport &&
        col("n_rhs") * 100 >= col("n_rows") * minAgreementPct &&
        col("n_rhs") < col("n_rows"))
      .select(col("lhs_val"), col("rhs_val").as("suggested_rhs"),
        col("n_rows"), col("n_rhs").as("n_majority"))
    df.select(col(idCol).as("id"), col(lhsCol).as("lhs_val"),
        col(rhsCol).as("bad_rhs"))
      .join(groups, "lhs_val")
      .filter(col("bad_rhs") =!= col("suggested_rhs"))
      .select(col("id"), col("lhs_val"), col("bad_rhs"),
        col("suggested_rhs"), col("n_rows"), col("n_majority"))
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
