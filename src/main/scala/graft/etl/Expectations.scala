package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract-check layer
  * (deequ / dbt-test / Great-Expectations style) a warehouse runs
  * before publishing a feed, complementing [[Profile]]'s open-ended
  * metrics with named pass/fail verdicts.
  *
  * Three check families, one result schema
  * (check_name, n_rows, n_violations, passed):
  *  - [[rowChecks]]: any row-level predicate; a NULL predicate result
  *    counts as a violation (SQL three-valued logic would otherwise let
  *    null rows slide through every range check);
  *  - [[uniqueness]]: key uniqueness as n_rows − n_distinct(key);
  *  - [[referential]]: foreign-key coverage as a left-anti count
  *    against the referenced key set.
  *
  * Scale shape: ALL row checks compute in ONE scan — each is a
  * conditional partial sum, map-side combined, one 1-row aggregate out;
  * the melt to one-row-per-check is a row-local explode of that single
  * row. Uniqueness is one distinct-agg; referential is one anti-join
  * whose dim side broadcasts under AQE. Nothing row-sized ever reaches
  * the driver or the output.
  */
object Expectations {

  /** Run named row-level predicates in one pass.
    * A row violates a check when the predicate is false OR null.
    */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.map { case (name, p) =>
      sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(s"__viol_$name")
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(col("__n"), explode(array(checks.map { case (name, _) =>
        struct(lit(name).as("check_name"), col(s"__viol_$name").as("n_violations"))
      }: _*)).as("m"))
      .select(col("m.check_name"), col("__n").as("n_rows"),
        col("m.n_violations"),
        (col("m.n_violations") === 0L).as("passed"))
  }

  /** Key-uniqueness check: violations = n_rows − n_distinct(keyCols). */
  def uniqueness(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.agg(count(lit(1)).as("n_rows"),
        countDistinct(keyCols.map(col).head, keyCols.map(col).tail: _*)
          .as("__distinct"))
      .select(lit(name).as("check_name"), col("n_rows"),
        (col("n_rows") - col("__distinct")).as("n_violations"),
        (col("n_rows") === col("__distinct")).as("passed"))
  }

  /** Referential-integrity check: violations = fact rows whose
    * `fkCol` has no match in `dim.pkCol` (NULL fk counts as a
    * violation — an orphan is an orphan however it is spelled).
    */
  def referential(fact: DataFrame, name: String, fkCol: String,
                  dim: DataFrame, pkCol: String): DataFrame = {
    val orphans = fact.select(col(fkCol))
      .join(dim.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val total = fact.agg(count(lit(1)).as("n_rows"))
    total.crossJoin(orphans)
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
  }
}
