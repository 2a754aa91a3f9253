package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global rank distributions.
  *
  * `percent_rank()/cume_dist() OVER (ORDER BY v)` with no PARTITION BY
  * forces every row into ONE window partition — fine at thousands of
  * rows, broken at billions. But both statistics depend only on each
  * row's VALUE, not its identity: percent_rank = (#rows with smaller
  * value) / (n-1) and cume_dist = (#rows with value ≤ v) / n, ties
  * sharing a result by definition.
  *
  * So: aggregate to one row per distinct value (map-side-combining
  * count), prefix-sum over the distinct-value relation, and join the
  * distribution back to the rows. The only single-partition step is the
  * prefix-sum window over DISTINCT VALUES — |domain| rows, not |data|
  * rows (for a bounded-domain column like a price or a score it is
  * constant in the data size). If the domain itself is huge, apply the
  * same trick recursively or range-repartition with broadcast partition
  * offsets; the join back is a plain shuffle join either way.
  *
  * Results are bit-identical to the window formulation: counts are
  * exact longs and each statistic is one IEEE division.
  */
object GlobalRank {

  /** Attach `pct_rank` and `cume` for the global ordering by `valueCol`
    * to every row of `df` (equivalent to the unpartitioned
    * percent_rank/cume_dist window, without the all-rows-one-partition
    * collapse).
    *
    * PRECONDITION: `valueCol` must be non-null — the join back is on the
    * value, and SQL equality never matches NULL, so null-valued rows
    * would silently drop (the window version instead sorts them first).
    * Filter or impute nulls before calling.
    */
  def rankDist(df: DataFrame, valueCol: String): DataFrame = {
    require(!df.columns.contains("pct_rank") && !df.columns.contains("cume"),
      "rankDist appends pct_rank/cume; input must not already define them")
    require(!df.columns.contains("__rd_val"),
      "rankDist reserves the internal column name __rd_val")
    val byVal = df.groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
    // prefix of counts over values strictly smaller
    val w = Window.orderBy(valueCol).rowsBetween(Window.unboundedPreceding, -1)
    val totals = df.agg(count(lit(1)).as("n_total"))
    val dist = byVal
      .withColumn("before", coalesce(sum("cnt").over(w), lit(0L)))
      .crossJoin(broadcast(totals))
      .select(col(valueCol).as("__rd_val"),
        when(col("n_total") === 1, 0.0)
          .otherwise(col("before") / (col("n_total") - 1)).as("pct_rank"),
        ((col("before") + col("cnt")) / col("n_total")).as("cume"))
    // null-SAFE equality: the window formulation this replaces ranks null
    // values (nulls-first), so a plain equi-join would silently drop them
    df.join(dist, col(valueCol) <=> col("__rd_val")).drop("__rd_val")
  }

  /** Global row number over a TOTAL order (sortCols must be unique in
    * combination) without a one-partition window: range-repartition on
    * the sort key, sort within partitions, then `zipWithIndex` — the
    * classic two-pass distributed numbering (one counting pass, one
    * labelling pass), each partition touching only its own rows. This is
    * the sanctioned per-partition-imperative RDD use: the DataFrame API
    * has no partition-offset primitive.
    */
  def withGlobalRowNumber(df: DataFrame, sortCols: Seq[String],
                          rnCol: String = "rn"): DataFrame = {
    require(!df.columns.contains(rnCol), s"input already defines $rnCol")
    val spark = df.sparkSession
    val cols = sortCols.map(col)
    val sorted = df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
    // range partitioning + local sort = global total order by construction,
    // independent of the sampled range boundaries (sortCols are unique)
    val schema = sorted.schema.add(rnCol, org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Exact NTILE(k) over a global total order, built on
    * [[withGlobalRowNumber]] — same bucket assignment as the SQL window
    * function (first n%k buckets get the extra row), with no data-sized
    * window partition anywhere in the plan.
    */
  def ntileByRange(df: DataFrame, k: Int, sortCols: Seq[String],
                   tileCol: String): DataFrame = {
    require(k > 0, "k must be positive")
    val reserved = Seq("__graft_rn", "__n", "__base", "__rem", "__cut")
    require(!df.columns.exists(reserved.contains),
      s"input must not use the reserved column names ${reserved.mkString(", ")}")
    val rn = "__graft_rn"
    val withRn = withGlobalRowNumber(df, sortCols, rn)
    val totals = withRn.agg(count(lit(1)).as("__n"))
    withRn.crossJoin(broadcast(totals))
      .withColumn("__base", expr(s"__n div $k"))
      .withColumn("__rem", expr(s"__n % $k"))
      .withColumn("__cut", col("__rem") * (col("__base") + 1))
      .withColumn(tileCol,
        when(col(rn) <= col("__cut"),
          expr(s"($rn - 1) div (__base + 1) + 1"))
          .otherwise(expr(s"__rem + ($rn - __cut - 1) div __base + 1"))
          .cast("int"))
      .drop(rn, "__n", "__base", "__rem", "__cut")
  }
}
