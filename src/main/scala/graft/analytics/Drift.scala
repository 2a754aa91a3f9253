package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift statistics between corpus slices.
  *
  * [[ksDrift]] is the exact two-sample Kolmogorov–Smirnov statistic
  * D = sup_x |F_A(x) − F_B(x)| over a numeric document feature — the
  * standard "did this crawl's length distribution shift?" monitor a
  * training-data pipeline runs between snapshots or sources.
  *
  * Exactness discipline: the supremum is selected on the INTEGER
  * cross-multiplied numerator |cumA·nB − cumB·nA| (exact DECIMAL(38,0)
  * products — long·long overflows past ~3·10⁹ rows per side), and only
  * the final winning value is divided and rounded, so both engines pick
  * the same argmax and emit the same double.
  *
  * Scale shape: one groupBy on the feature value collapses the corpus to
  * its distinct-value domain (thousands of distinct lengths, independent
  * of corpus size); the cumulative sums then run over that bounded
  * domain. Same bounded-domain window rationale as Skyline/GlobalRank —
  * for an unbounded-domain feature, range-partition the domain and use
  * Packing.withRunningTotal's two-pass prefix instead.
  */
object Drift {

  private val Dec = DecimalType(19, 0)

  /** KS statistic of `featureCol` between two halves of the corpus split
    * by even/odd numeric suffix of `source` (srcN). Returns one row:
    * (n_a, n_b, ks_at, ks_stat) where ks_at is the smallest feature
    * value attaining the supremum.
    */
  def ksDrift(documents: DataFrame, featureCol: String = "n_chars"): DataFrame = {
    val g = documents.select(
      col(featureCol).as("x"),
      (expr("CAST(substring(source, 4) AS INT)") % 2 === 0).as("is_a"))
    val counts = g.groupBy("x").agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    counts.count() // materialize once: the window branch and the totals
                   // branch would otherwise each re-scan the corpus
    // bounded domain: one row per distinct feature value
    val w = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.select(col("x"),
      sum("ca").over(w).as("cuma"), sum("cb").over(w).as("cumb"))
    // totals from the pre-window counts — the final cumulative values,
    // without dragging a second window evaluation into the plan
    val tot = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val scored = cum.crossJoin(broadcast(tot))
      .withColumn("d_num",
        abs(col("cuma").cast(Dec) * col("nb").cast(Dec) -
            col("cumb").cast(Dec) * col("na").cast(Dec)))
    scored.orderBy(desc("d_num"), asc("x")).limit(1)
      .select(
        col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        col("x").as("ks_at"),
        round(col("d_num").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")), 6).as("ks_stat"))
  }
}
