package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates — the
  * "maintain the materialized view from the CDC delta" step that makes a
  * 100 TB warehouse's summary tables affordable: instead of re-scanning
  * the base relation per batch, fold the (tiny) change batch into the
  * existing aggregate. SUM and COUNT are self-maintainable under inserts
  * AND deletes (Gupta & Mumick's classic IVM taxonomy), provided delete
  * rows carry their before-image values — the standard CDC contract.
  *
  * new(g) = (cnt_old + Σ±1, sum_old + Σ±v); groups reaching count 0
  * disappear, unseen groups appear. One hash agg over the changes batch
  * and one full-outer join keyed on the group — both sized by the
  * AGGREGATE and the BATCH, never by the base relation. Use exact types
  * for the value (DECIMAL money, longs): float sums would drift from the
  * recompute under reordering; decimals make incremental == recompute
  * bit-for-bit (the oracle proves it by recomputing from scratch).
  *
  * An UPDATE is a delete(before-image) + insert(after-image) pair in the
  * changes batch, per the usual CDC encoding. MIN/MAX are NOT
  * self-maintainable under deletes (a deleted max forces a rescan of the
  * group) and are deliberately out of scope.
  */
object Ivm {

  /** Maintain `baseAgg` (groupCols, cntCol, sumCol) with a changes batch
    * (groupCols, valueCol, deleteCol).
    */
  def applyDelta(baseAgg: DataFrame, changes: DataFrame,
                 groupCols: Seq[String], valueCol: String,
                 cntCol: String = "cnt", sumCol: String = "total",
                 deleteCol: String = "is_delete"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val sign = when(col(deleteCol), lit(-1L)).otherwise(lit(1L))
    val delta = changes.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("__cnt_d"),
        sum(when(col(deleteCol), -col(valueCol)).otherwise(col(valueCol)))
          .as("__sum_d"))
    val zeroSum = lit(0).cast(baseAgg.schema(sumCol).dataType)
    // NULL-SAFE group equality: SQL GROUP BY folds NULL keys into one
    // group on both sides, but a plain USING join would never match the
    // null group's base row to its delta row — a delete for g=NULL would
    // silently drop and the view would diverge from the recompute forever
    val b = baseAgg.alias("b"); val d = delta.alias("d")
    val cond = groupCols.map(c => col(s"b.$c") <=> col(s"d.$c")).reduce(_ && _)
    b.join(d, cond, "full_outer")
      .select(
        groupCols.map(c => coalesce(col(s"b.$c"), col(s"d.$c")).as(c)) ++ Seq(
          (coalesce(col(cntCol), lit(0L)) + coalesce(col("__cnt_d"), lit(0L)))
            .as(cntCol),
          (coalesce(col(sumCol), zeroSum) + coalesce(col("__sum_d"), zeroSum))
            .as(sumCol)): _*)
      .filter(col(cntCol) > 0)
  }
}
