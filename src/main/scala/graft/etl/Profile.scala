package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the warehouse-hygiene pass (deequ/dbt-test style)
  * run before trusting a new feed: per-column null and distinct counts.
  *
  * One scan, one aggregation: all 2k metrics are computed in a single
  * `agg` (Spark plans the multiple COUNT(DISTINCT)s via a single Expand —
  * k× row amplification map-side, but still one shuffle of partial
  * states, no per-column re-scans), then melted to one row per column
  * with a row-local explode. Metrics deliberately stop at exact integer
  * counts: min/max/mean stringify engine-specifically for doubles, and
  * approx-distinct is estimator-specific — both would break the
  * differential gate this operator itself is meant to feed.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(
          lit(c).as("col_name"), // not "column": reserved in ANSI/DuckDB
          col(s"__nulls_$c").as("n_nulls"),
          col(s"__distinct_$c").as("n_distinct"))
      }: _*)).as("m"))
      .select("m.*")
  }

  def profile(df: DataFrame): DataFrame = profile(df, df.columns.toSeq)

  /** Profile DRIFT between two snapshots of the same table — the
    * schema-stable feed-regression screen run on every load (the
    * dbt-source-freshness / deequ AnomalyCheck shape): per column, the
    * null and distinct counts of both snapshots side by side with
    * their deltas, plus the row counts folded into every row (so one
    * relation carries the whole report).
    *
    * Both profiles are ONE aggregation pass each ([[profile]]); the
    * join is on the k-row column-name relation — bounded domain. All
    * metrics stay exact longs, so the report is hash-replayable.
    *
    * Output: one row per column (col_name, rows_base, rows_next,
    * nulls_base, nulls_next, nulls_delta, distinct_base,
    * distinct_next, distinct_delta).
    */
  def profileDiff(base: DataFrame, next: DataFrame,
                  cols: Seq[String]): DataFrame = {
    val pb = profile(base, cols).select(col("col_name"),
      col("n_nulls").as("nulls_base"), col("n_distinct").as("distinct_base"))
    val pn = profile(next, cols).select(col("col_name"),
      col("n_nulls").as("nulls_next"), col("n_distinct").as("distinct_next"))
    val rb = base.agg(count(lit(1)).as("rows_base"))
    val rn = next.agg(count(lit(1)).as("rows_next"))
    pb.join(pn, "col_name")
      .crossJoin(broadcast(rb)).crossJoin(broadcast(rn))
      .select(col("col_name"), col("rows_base"), col("rows_next"),
        col("nulls_base"), col("nulls_next"),
        (col("nulls_next") - col("nulls_base")).as("nulls_delta"),
        col("distinct_base"), col("distinct_next"),
        (col("distinct_next") - col("distinct_base")).as("distinct_delta"))
  }

  /** DuckDB replay of [[profileDiff]]: the caller supplies the WITH
    * clause that defines the two snapshot relations; one aggregate CTE
    * per side, melted by a UNION ALL over the column list.
    */
  def profileDiffOracleSql(withClause: String, baseRel: String,
                           nextRel: String, cols: Seq[String]): String = {
    def aggs(rel: String) = cols.map { c =>
      s"""SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS nulls_$c,
         |       COUNT(DISTINCT $c) AS dist_$c""".stripMargin
    }.mkString(",\n       ") + s",\n       COUNT(*) AS nr FROM $rel"
    val melted = cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |       CAST(pb.nr AS BIGINT) AS rows_base,
         |       CAST(pn.nr AS BIGINT) AS rows_next,
         |       CAST(pb.nulls_$c AS BIGINT) AS nulls_base,
         |       CAST(pn.nulls_$c AS BIGINT) AS nulls_next,
         |       CAST(pn.nulls_$c - pb.nulls_$c AS BIGINT) AS nulls_delta,
         |       CAST(pb.dist_$c AS BIGINT) AS distinct_base,
         |       CAST(pn.dist_$c AS BIGINT) AS distinct_next,
         |       CAST(pn.dist_$c - pb.dist_$c AS BIGINT) AS distinct_delta
         |FROM pb CROSS JOIN pn""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$withClause,
       |pb AS (SELECT ${aggs(baseRel)}),
       |pn AS (SELECT ${aggs(nextRel)})
       |$melted""".stripMargin
  }
}
