package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — rows not STRICTLY dominated when both
  * dimensions are maximized: no other row is ≥ in both and > in at least
  * one (Börzsönyi, Kossmann & Stocker, "The Skyline Operator", ICDE'01).
  *
  * The naive formulation is an all-pairs NOT EXISTS (the oracle runs
  * exactly that, a genuinely different algorithm). The engine instead
  * uses the 2-D structure: a row (x, y) survives iff
  *
  *   y = M₂(x)   — best y among rows with the SAME x — and
  *   y > M₁(x)   — best y among rows with STRICTLY GREATER x
  *
  * (rows tied on both coordinates never dominate each other, so whole
  * duplicate points survive together). M₂ is one map-side-combining hash
  * agg; M₁ is an EXCLUSIVE prefix max over the distinct-x relation in
  * x-descending order. The distinct-x domain is data-sized for
  * continuous dimensions (prices, timestamps), so the prefix max is the
  * classic two-pass distributed scan — the [[Packing.withRunningTotal]]
  * construction with MAX as the monoid: range partition + local sort
  * gives the global order, pass 1 reduces each partition to one maximum
  * (#partitions values to the driver, never #rows), pass 2 streams each
  * partition once carrying its broadcast offset. No single-partition
  * Window anywhere. The join back is a plain shuffle join on x.
  *
  * All comparisons are on caller-provided orderable columns; use exact
  * types (cents, dates, longs) for cross-engine determinism. NULLs in
  * either dimension are a precondition violation (SQL comparisons never
  * match them) — filter first.
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val reserved = Seq("__sky_m1", "__sky_m2")
    require(!df.columns.exists(reserved.contains),
      s"input must not use the reserved column names ${reserved.mkString(", ")}")
    val m2 = df.groupBy(xCol).agg(max(yCol).as("__sky_m2"))
    val dist = withPrefixMaxDesc(m2, xCol, "__sky_m2", "__sky_m1")
    df.join(dist, xCol)
      .filter(col(yCol) === col("__sky_m2") &&
        (col("__sky_m1").isNull || col(yCol) > col("__sky_m1")))
      .select(df.columns.map(col): _*) // restore caller column order
  }

  /** Exclusive running MAX of `valueCol` over the global x-DESCENDING
    * order, appended as `outCol` (NULL for the globally first row — no
    * predecessor). Requires `xCol` values distinct (callers group by x
    * first); determinism then depends only on the global order, not on
    * where Spark's sampled range boundaries land.
    *
    * Two-pass distributed prefix scan (the sanctioned per-partition
    * -imperative RDD use, same rule as [[Packing.withRunningTotal]] /
    * GlobalRank.withGlobalRowNumber — the DataFrame API has no
    * partition-offset primitive). Values compare via their external
    * `Comparable` form (Long, Integer, java.sql.Date/Timestamp,
    * java.math.BigDecimal, String — every orderable atomic type Spark
    * surfaces), matching Catalyst's ordering on exact types.
    */
  private def withPrefixMaxDesc(df: DataFrame, xCol: String,
                                valueCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(xCol).desc)
      .sortWithinPartitions(col(xCol).desc)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    def gt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) > 0
    // NOT cached: both passes run jobs over the same RDD object, so the
    // range exchange's map output is written once and the second job
    // reuses the shuffle files (see Packing.withRunningTotal).
    val rdd = sorted.rdd
    // pass 1: one maximum per partition → driver (#partitions values)
    val partMaxes = rdd.mapPartitionsWithIndex { (i, it) =>
      var m: Any = null
      it.foreach { r => val v = r.get(vIdx); if (m == null || gt(v, m)) m = v }
      Iterator((i, m))
    }.collect().sortBy(_._1).map(_._2)
    // exclusive prefix max per partition (null = no predecessor rows)
    val offsets = partMaxes.scanLeft(null: Any) { (acc, cur) =>
      if (cur == null) acc else if (acc == null || gt(cur, acc)) cur else acc
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(outCol, sorted.schema(vIdx).dataType,
      nullable = true)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc: Any = bc.value(i)
      it.map { r =>
        val prev = acc
        val v = r.get(vIdx)
        if (acc == null || gt(v, acc)) acc = v
        Row.fromSeq(r.toSeq :+ prev)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
