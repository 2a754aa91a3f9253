package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional layout
  * technique lakehouse formats (Delta OPTIMIZE ZORDER, Iceberg sort
  * orders) use for data skipping: interleaving the bits of two sort keys
  * makes files tight in BOTH dimensions, so min/max footer pruning works
  * for predicates on either column, not just the leading sort key.
  *
  * The z-value is pure integer bit math (an unrolled OR of masked
  * shifts) — codegen'd, row-local, engine-reproducible. Keys must be
  * non-negative and fit `bits` bits (2^21 default); rank-compress wider
  * domains first (e.g. `GlobalRank.withGlobalRowNumber`), which also
  * equidistributes skewed keys along the curve.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits: a's bit i lands at 2i,
    * b's at 2i+1. Result fits 2·bits ≤ 62 bits of a long.
    */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Range-repartition + locally sort by the z-value of (keyA, keyB):
    * the write-side layout pass. Each output file then spans a compact
    * z-range ⇒ compact ranges in BOTH key dimensions ⇒ parquet
    * min/max skipping prunes on either predicate.
    */
  def clusterByZ(df: DataFrame, keyA: String, keyB: String,
                 numPartitions: Int, bits: Int = 21): DataFrame = {
    val z = zValue(col(keyA), col(keyB), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
