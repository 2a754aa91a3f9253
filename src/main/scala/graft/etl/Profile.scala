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
}
