package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * self-maintainable under deletes (a deleted max may force a rescan of
  * its group): [[applyDeltaMinMax]] maintains them with the standard
  * dirty-group repair — inserts fold in algebraically, and only groups
  * whose delete batch hit the stored extremum recompute, from the
  * post-batch base restricted to exactly those groups.
  */
object Ivm {

  /** The shared delta-merge core of [[applyDelta]] and
    * [[applyDeltaStats]]: null-safe full-outer join of a view onto a
    * pre-aggregated delta (count column `__cnt_d` plus `sumCols` as
    * (viewColumn, deltaColumn) pairs), coalesce-add every measure back
    * to the view's own column type, drop groups whose count reaches 0.
    *
    * NULL-SAFE group equality: SQL GROUP BY folds NULL keys into one
    * group on both sides, but a plain USING join would never match the
    * null group's base row to its delta row — a delete for g=NULL would
    * silently drop and the view would diverge from the recompute forever.
    */
  private def mergeDelta(baseAgg: DataFrame, delta: DataFrame,
                         groupCols: Seq[String], cntCol: String,
                         sumCols: Seq[(String, String)]): DataFrame = {
    val b = baseAgg.alias("b"); val d = delta.alias("d")
    val cond = groupCols.map(c => col(s"b.$c") <=> col(s"d.$c")).reduce(_ && _)
    b.join(d, cond, "full_outer")
      .select(
        groupCols.map(c => coalesce(col(s"b.$c"), col(s"d.$c")).as(c)) ++ Seq(
          (coalesce(col(cntCol), lit(0L)) + coalesce(col("__cnt_d"), lit(0L)))
            .as(cntCol)) ++
          sumCols.map { case (viewCol, deltaCol) =>
            val t = baseAgg.schema(viewCol).dataType
            val zero = lit(0).cast(t)
            (coalesce(col(viewCol), zero) + coalesce(col(deltaCol), zero))
              .cast(t).as(viewCol)
          }: _*)
      .filter(col(cntCol) > 0)
  }

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
    mergeDelta(baseAgg, delta, groupCols, cntCol, Seq(sumCol -> "__sum_d"))
  }

  /** Maintain exact power sums (cnt, Σx, Σx²) per group under inserts
    * AND deletes — the self-maintainable core of AVG / VAR / STDDEV
    * views. Unlike min/max (which need the retraction-repair pass of
    * [[applyDeltaMinMax]]), power sums retract EXACTLY: a delete folds
    * in as (−1, −x, −x²), so no group ever needs the base relation.
    * The sums must be DECIMAL (exact): float power sums would drift
    * from the recompute after enough retractions — the same reason the
    * library's money sums go through DECIMAL(18,2).
    *
    * Derived mean/variance are the CALLER's one division at read time
    * (keep the view in sums — deriving eagerly would lose exactness for
    * the next delta). Per-batch cost: one hash agg over the batch plus
    * one group-domain-sized null-safe full-outer join — never a base
    * rescan; at 100 TB the view is group-cardinality-sized model state.
    */
  def applyDeltaStats(baseStats: DataFrame, changes: DataFrame,
                      groupCols: Seq[String], valueCol: String,
                      cntCol: String = "cnt", sumCol: String = "sx",
                      sqCol: String = "sx2",
                      deleteCol: String = "is_delete"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = col(valueCol)
    val delta = changes.groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col(deleteCol), -1L).otherwise(1L)).as("__cnt_d"),
        sum(when(col(deleteCol), -v).otherwise(v)).as("__sx_d"),
        sum(when(col(deleteCol), -(v * v)).otherwise(v * v)).as("__sx2_d"))
    mergeDelta(baseStats, delta, groupCols, cntCol,
      Seq(sumCol -> "__sx_d", sqCol -> "__sx2_d"))
  }

  /** Maintain the per-(group, value) multiplicity SUPPORT relation that
    * makes COUNT(DISTINCT) incrementally maintainable under inserts AND
    * deletes. Count-distinct is famously NOT self-maintainable from the
    * view alone (deleting a value's last row must drop the count, but
    * the view doesn't know which row was last) — the classic fix (Gupta
    * & Mumick's auxiliary-view method) stores (groupCols, valueCol,
    * cnt): inserts/deletes fold in as ±1 on the multiplicity, a value
    * leaves the group exactly when its multiplicity reaches 0, and the
    * distinct count is then an exact aggregate over the support —
    * [[distinctCounts]]. Per-batch cost is one hash agg over the batch
    * plus one full-outer join keyed on (group, value) — sized by the
    * DISTINCT domain and the batch, never the base relation.
    *
    * NULL group keys AND null values match null-safely (SQL GROUP BY
    * folds both); note COUNT(DISTINCT v) ignores NULL v, which
    * [[distinctCounts]] mirrors.
    */
  def applyDeltaDistinct(support: DataFrame, changes: DataFrame,
                         groupCols: Seq[String], valueCol: String,
                         cntCol: String = "cnt",
                         deleteCol: String = "is_delete"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val keys = groupCols :+ valueCol
    val sign = when(col(deleteCol), lit(-1L)).otherwise(lit(1L))
    val delta = changes.groupBy(keys.map(col): _*).agg(sum(sign).as("__cnt_d"))
    val b = support.alias("b"); val d = delta.alias("d")
    val cond = keys.map(c => col(s"b.$c") <=> col(s"d.$c")).reduce(_ && _)
    b.join(d, cond, "full_outer")
      .select(
        keys.map(c => coalesce(col(s"b.$c"), col(s"d.$c")).as(c)) :+
          (coalesce(col(cntCol), lit(0L)) + coalesce(col("__cnt_d"), lit(0L)))
            .as(cntCol): _*)
      .filter(col(cntCol) > 0)
  }

  /** The COUNT(DISTINCT valueCol) view over an [[applyDeltaDistinct]]
    * support relation: one map-side-combined aggregate sized by the
    * distinct domain. NULL values are excluded, matching SQL
    * COUNT(DISTINCT) semantics on the recompute path.
    */
  def distinctCounts(support: DataFrame, groupCols: Seq[String],
                     valueCol: String,
                     outCol: String = "n_distinct"): DataFrame =
    support.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(outCol))

  /** Maintained exact MEDIAN (PERCENTILE_DISC(0.5)) view over the SAME
    * [[applyDeltaDistinct]] support relation — percentiles are the other
    * famously non-self-maintainable aggregate (a delete can move the
    * median to a value the view no longer stores), and the same
    * (group, value, multiplicity) auxiliary relation fixes both: fold
    * CDC batches into the support with [[applyDeltaDistinct]], then read
    * the median as the smallest value whose cumulative multiplicity
    * reaches half the group total (the discrete-percentile definition —
    * exact integer comparisons, no interpolation to drift
    * cross-engine).
    *
    * Output: (groupCols*, n_rows, outCol).
    *
    * Scale: the per-group cumulative window partitions by group and is
    * bounded by the group's DISTINCT-value domain (the support grain),
    * never its row count; the totals join is support-sized. NULL values
    * are excluded, matching PERCENTILE_DISC over non-null inputs.
    */
  def medianView(support: DataFrame, groupCols: Seq[String], valueCol: String,
                 cntCol: String = "cnt", outCol: String = "median"): DataFrame = {
    val gcols = groupCols.map(col)
    val nn = support.filter(col(valueCol).isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col(valueCol))
    val tot = nn.groupBy(gcols: _*).agg(sum(col(cntCol)).as("n_rows"))
    nn.withColumn("__cum", sum(col(cntCol)).over(w))
      .join(tot, groupCols)
      .filter(col("__cum") * 2 >= col("n_rows"))
      .groupBy((groupCols :+ "n_rows").map(col): _*)
      .agg(min(col(valueCol)).as(outCol))
  }

  /** HDR-style log-bucket id of a non-negative integer quantity (cents,
    * tokens, bytes): bucket = digits·100 + first-two-digits, i.e. a
    * base-10 exponent with a two-significant-digit mantissa — ≤ 10%
    * relative bucket width (exact below 10), ~90 buckets per decade,
    * ≤ ~1700 buckets across the full long range. Pure string/integer
    * arithmetic so the id replays bit-identically in DuckDB (no float
    * log whose rounding could flip a boundary value's bucket).
    *
    * This is the APPROXIMATE-quantile counterpart of [[medianView]]'s
    * exact support relation: keyed on the bucket instead of the raw
    * value, the support is BOUNDED model state (groups × ≤1700) at any
    * corpus size, while staying exactly incrementally maintainable —
    * histogram counts add and retract like any count, so the same
    * [[applyDeltaDistinct]] fold maintains it under CDC batches.
    */
  def logBucket(x: Column): Column =
    // negative inputs would silently mis-bucket ("-5" has length 2 and
    // a "-" mantissa digit) — fail loudly instead, the library's
    // overflow-guard discipline
    when(x < 0, raise_error(concat(
        lit("logBucket: negative input "), x.cast("string"))))
      .when(length(x.cast("string")) === 1, x * 10 + 100)
      .otherwise(length(x.cast("string")).cast("long") * 100 +
        substring(x.cast("string"), 1, 2).cast("long"))

  /** Inverse of [[logBucket]]: the bucket's inclusive lower bound — the
    * deterministic value a quantile read-out reports. Built by string
    * concatenation (mantissa ++ zeros), not float powers, for the same
    * cross-engine exactness reason as [[logBucket]].
    */
  def logBucketLowerBound(b: Column): Column =
    when(b < 200, floor((b - 100) / 10).cast("long"))
      .otherwise(rpad((b % 100).cast("string"),
        floor(b / 100).cast("int"), lit("0")).cast("long"))

  /** Maintained APPROXIMATE-quantile view over a [[logBucket]] histogram
    * support relation (groupCols, bucketCol, cnt) — the bounded-state
    * sibling of [[medianView]] for the scales where the exact
    * per-distinct-value support is itself data-sized. For each
    * requested quantile q (micro units), reports the lower bound of the
    * smallest bucket whose cumulative count reaches ⌈q·N/10⁶⌉ — the
    * discrete-percentile definition over bucket lower bounds, ≤ 10%
    * below the true quantile by the bucket-width guarantee. The
    * comparison is cross-multiplied integers (10⁶·cum ≥ q·N), no
    * division, no float.
    *
    * Output: (groupCols*, n_rows, q<micro>_lo*). Scale: the cumulative
    * window partitions by group over ≤ ~1700 bucket rows; the view
    * refresh is [[applyDeltaDistinct]] at CDC-batch cost.
    */
  def quantileView(support: DataFrame, groupCols: Seq[String],
                   bucketCol: String, cntCol: String = "cnt",
                   quantilesMicro: Seq[Long] = Seq(500000L, 950000L)): DataFrame = {
    require(quantilesMicro.nonEmpty &&
      quantilesMicro.forall(q => q > 0 && q <= 1000000L),
      "quantiles must be in (0, 1] micro units")
    val gcols = groupCols.map(col)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col(bucketCol))
    val tot = support.groupBy(gcols: _*).agg(sum(col(cntCol)).as("n_rows"))
    val cum = support.withColumn("__cum", sum(col(cntCol)).over(w))
      .join(tot, groupCols)
    val qCols = quantilesMicro.map { q =>
      min(when(col("__cum").cast(dec) * 1000000L >=
          col("n_rows").cast(dec) * q, col(bucketCol)))
        .as(s"__qb_$q")
    }
    cum.groupBy((groupCols :+ "n_rows").map(col): _*)
      .agg(qCols.head, qCols.tail: _*)
      .select((groupCols :+ "n_rows").map(col) ++ quantilesMicro.map(q =>
        logBucketLowerBound(col(s"__qb_$q")).as(s"q${q}_lo")): _*)
  }

  /** Maintained TOP-K view refresh: fold the changes batch into the
    * (groupCols, cnt, total) aggregate via [[applyDelta]], then re-rank
    * to the top `k` groups by the maintained total (desc, group asc —
    * a total order). The ranking step is the cheap part — it runs over
    * the AGGREGATE, never the base relation, and plans as
    * TakeOrderedAndProject (per-partition top-k, then a k-row merge on
    * the driver side of the exchange) — so a 100 TB "top sellers"
    * dashboard view refreshes at CDC-batch cost. Unlike MIN/MAX, no
    * retraction repair is ever needed: the full ordered domain IS the
    * maintained aggregate, so a deleted top element simply falls out of
    * the re-rank.
    */
  def topKView(baseAgg: DataFrame, changes: DataFrame,
               groupCols: Seq[String], valueCol: String, k: Int,
               cntCol: String = "cnt", sumCol: String = "total",
               deleteCol: String = "is_delete"): DataFrame = {
    require(k >= 1, "k must be positive")
    val maintained = applyDelta(baseAgg, changes, groupCols, valueCol,
      cntCol, sumCol, deleteCol)
    maintained.orderBy(col(sumCol).desc +: groupCols.map(c => col(c).asc): _*)
      .limit(k)
  }

  /** Signed delta of an inner equi-JOIN view — the missing piece between
    * a CDC feed over the base tables and [[applyDelta]] on an aggregate
    * OVER the join. The classic bilinear delta rule
    * (Δ(A⋈B) = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB, weights multiplying — Gupta &
    * Mumick again; DBSP/ differential dataflow generalize the same
    * algebra) with every row weight in {+1, −1}: a delete carries −1,
    * the weight of a joined pair is the product, and a pair of deletes
    * re-inserts (+1) exactly because its join row was subtracted twice
    * by the two cross terms. Since all weights are ±1, the output is
    * encoded back as a `deleteCol` changes batch — feed it straight to
    * [[applyDelta]] (or [[applyDeltaMinMax]]) keyed on the view's
    * groups.
    *
    * Both key columns keep their own names (o_orderkey vs l_orderkey
    * style), so the joined row carries the full A-and-B column set.
    *
    * Cost shape: never A⋈B. The two cross terms join the BATCH against
    * one base relation each — with a CDC-sized batch the batch side
    * broadcasts (AQE does this from its size) and the base streams
    * through map-side; ΔA⋈ΔB is batch×batch. This is what makes a
    * 100 TB join view maintainable: per-batch work is
    * O(batch × join fan-out), not O(base).
    */
  def joinViewChanges(aOld: DataFrame, aChanges: DataFrame,
                      bOld: DataFrame, bChanges: DataFrame,
                      aKey: String, bKey: String,
                      deleteCol: String = "is_delete"): DataFrame = {
    val w = when(col(deleteCol), lit(-1)).otherwise(lit(1))
    val aD = aChanges.withColumn("__wa", w).drop(deleteCol)
    val bD = bChanges.withColumn("__wb", w).drop(deleteCol)
    val a0 = aOld.withColumn("__wa", lit(1))
    val b0 = bOld.withColumn("__wb", lit(1))
    def joined(l: DataFrame, r: DataFrame) = l.join(r, col(aKey) === col(bKey))
    joined(aD, b0).unionByName(joined(a0, bD)).unionByName(joined(aD, bD))
      .withColumn(deleteCol, col("__wa") * col("__wb") < 0)
      .drop("__wa", "__wb")
  }

  /** Maintain a (groupCols, cntCol, minCol, maxCol) view under an
    * insert/delete changes batch.
    *
    * Inserts are algebraic: `new_min = least(old, batch_min)` (and
    * symmetrically for max). Deletes are where min/max stop being
    * self-maintainable — a delete AT the stored extremum invalidates it.
    * Those groups (and only those) are marked dirty and their extrema
    * recompute from `baseAfter`, the base relation with the batch already
    * applied, semi-join-restricted to the dirty group set. Cost is
    * therefore sized by the batch + the aggregate + (dirty groups ×
    * their base rows) — the base is never scanned for clean groups. The
    * dirty test uses ≤/≥ (not =) so an inconsistent before-image below
    * the stored min still triggers repair instead of silent divergence.
    *
    * Counts are maintained exactly as [[applyDelta]]; groups reaching
    * count 0 disappear (checked BEFORE repair, so vanished groups never
    * recompute). NULL group keys match null-safely, NULL measure values
    * are ignored by min/max on both the incremental and recompute paths
    * (SQL aggregate semantics).
    */
  def applyDeltaMinMax(baseAgg: DataFrame, changes: DataFrame, baseAfter: DataFrame,
                       groupCols: Seq[String], valueCol: String,
                       cntCol: String = "cnt", minCol: String = "mn",
                       maxCol: String = "mx",
                       deleteCol: String = "is_delete"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val sign = when(col(deleteCol), lit(-1L)).otherwise(lit(1L))
    val delta = changes.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("__cnt_d"),
        min(when(!col(deleteCol), col(valueCol))).as("__ins_mn"),
        max(when(!col(deleteCol), col(valueCol))).as("__ins_mx"),
        min(when(col(deleteCol), col(valueCol))).as("__del_mn"),
        max(when(col(deleteCol), col(valueCol))).as("__del_mx"))
    val b = baseAgg.alias("b"); val d = delta.alias("d")
    val cond = groupCols.map(c => col(s"b.$c") <=> col(s"d.$c")).reduce(_ && _)
    // survivors feed the clean path AND the dirty-group set — materialize
    // the aggregate-sized relation so the full-outer join runs once
    val survivors = graft.Caching.materialize(b.join(d, cond, "full_outer")
      .select(groupCols.map(c => coalesce(col(s"b.$c"), col(s"d.$c")).as(c)) ++ Seq(
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("__cnt_d"), lit(0L)))
          .as(cntCol),
        col(minCol), col(maxCol), col("__ins_mn"), col("__ins_mx"),
        (col("__del_mn").isNotNull && col(minCol).isNotNull &&
          col("__del_mn") <= col(minCol)).as("__dirty_mn"),
        (col("__del_mx").isNotNull && col(maxCol).isNotNull &&
          col("__del_mx") >= col(maxCol)).as("__dirty_mx")): _*)
      .filter(col(cntCol) > 0))
    val dirty = survivors.filter(col("__dirty_mn") || col("__dirty_mx"))
      .select(groupCols.map(col): _*)
    // the ONLY base access: recompute extrema for retraction-hit groups
    val ba = baseAfter.alias("ba"); val g = dirty.alias("g")
    val recCond = groupCols.map(c => col(s"ba.$c") <=> col(s"g.$c")).reduce(_ && _)
    val rec = ba.join(g, recCond, "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(valueCol)).as("__rec_mn"), max(col(valueCol)).as("__rec_mx"))
    val sv = survivors.alias("sv"); val r = rec.alias("r")
    val attachCond = groupCols.map(c => col(s"sv.$c") <=> col(s"r.$c")).reduce(_ && _)
    sv.join(r, attachCond, "left_outer")
      .select(groupCols.map(c => col(s"sv.$c").as(c)) ++ Seq(
        col(cntCol),
        when(col("__dirty_mn"), col("__rec_mn"))
          .otherwise(least(col(minCol), col("__ins_mn"))).as(minCol),
        when(col("__dirty_mx"), col("__rec_mx"))
          .otherwise(greatest(col(maxCol), col("__ins_mx"))).as(maxCol)): _*)
  }
}
