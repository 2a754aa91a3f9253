package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter runtime join reduction — the "runtime filter" /
  * semi-join pushdown every warehouse engine grows once fact⋈fact joins
  * dominate (Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled`
  * applies the identical rewrite when statistics let it; this operator is
  * the explicit form for when they don't, e.g. a filtered build side whose
  * selectivity Catalyst can't estimate).
  *
  * Shape: the build side's join keys are folded into a
  * [[org.apache.spark.util.sketch.BloomFilter]] (distributed treeAggregate,
  * no shuffle), the filter ships to every probe task as one broadcast
  * object, and a codegen'd `might_contain` predicate drops non-matching
  * probe rows AT THE SCAN — before they pay the shuffle for the exact
  * semi-join that removes the bloom's false positives. Results are
  * therefore exactly the plain semi-join's (the oracle proves it); only
  * the plan is different.
  *
  * 100 TB sizing: the filter costs ~9.6 bits/key at 1 % fpp — 100 M build
  * keys ≈ 120 MB broadcast, well past where broadcasting the *relation*
  * (hash join) stops being possible. With build selectivity σ over the
  * probe's keyspace, shuffle volume for the semi-join drops to ~σ + fpp of
  * the probe — on a 100 TB fact with a 1 % build side that is the
  * difference between shuffling 1 TB and shuffling 100 TB.
  */
object RuntimeFilter {

  /** `might_contain(bloom, key)` over a broadcast-serialized
    * [[BloomFilter]] — codegen'd membership test against long keys
    * (`BloomFilterImpl` is `Serializable`, so the task closure carries it
    * like any broadcast reference object; codegen binds it once per task
    * via `addReferenceObj`, not per row).
    */
  case class LongBloomMightContain(child: Expression, filter: BloomFilter)
      extends UnaryExpression with Predicate with Serializable {

    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_might_contain"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${child.dataType.simpleString}")

    override def nullSafeEval(key: Any): Any =
      filter.mightContainLong(key.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bloomRef = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      defineCodeGen(ctx, ev, key => s"$bloomRef.mightContainLong($key)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def asLong(c: Column): Expression = {
    val e = ColumnBridge.expression(c)
    if (e.dataType == LongType) e else Cast(e, LongType)
  }

  /** Probe-side prefilter column: true iff `key` might be in `filter`. */
  def mightContain(filter: BloomFilter, key: Column): Column =
    ColumnBridge.column(LongBloomMightContain(asLong(key), filter))

  /** Distributed bloom build over a bigint key column: one filter per
    * partition, merged up a tree. Not `df.stat.bloomFilter` — Spark 4's
    * version inserts `xxhash64(value)` (it pairs with the internal
    * `might_contain`), which a raw [[BloomFilter.mightContainLong]] probe
    * would never match; raw `putLong` here keeps both sides on one public,
    * documented hash. The `.rdd` hop is the bounded-model-state pattern
    * (as in Pca's covariance pass): each partition reduces to ONE sketch
    * object, and only #partitions sketches cross the wire.
    */
  def buildLongBloom(keys: DataFrame, keyCol: String,
                     expectedItems: Long, fpp: Double): BloomFilter = {
    import keys.sparkSession.implicits._
    val n = expectedItems.max(1L)
    val ds = keys.select(col(keyCol).cast("long")).na.drop().as[Long]
    val perPartition = ds.rdd.mapPartitions { it =>
      val f = BloomFilter.create(n, fpp)
      it.foreach(f.putLong)
      Iterator.single(f)
    }
    // getNumPartitions is metadata (no job); isEmpty() would instead run
    // an extra job that folds all of partition 0 into a sketch only to
    // throw it away — mapPartitions emits a (possibly empty) filter per
    // partition, so zero partitions is the only truly empty case
    if (perPartition.getNumPartitions == 0) BloomFilter.create(n, fpp)
    else perPartition.treeReduce { (a, b) => a.mergeInPlace(b); a }
  }

  /** Exact semi-join of `probe` against `build`'s keys, with a bloom
    * runtime filter applied to the probe scan first.
    *
    * `expectedItems` sizes the filter; when < 0 one count job over the
    * (already filtered, build-sized) side runs instead. Row count is an
    * overestimate of distinct keys — a strictly safe direction (bigger
    * filter, lower fpp than requested).
    */
  def bloomSemiJoin(probe: DataFrame, probeKey: String,
                    build: DataFrame, buildKey: String,
                    fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    // the build side feeds up to three consumers (sizing count, sketch
    // build, exact-verify key set) — persist the one-column projection so
    // the "filtered side Catalyst can't estimate" is scanned once, not
    // three times. Release follows the library-wide clearCache contract.
    val keyProj = build.select(col(buildKey).as("__build_key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = if (expectedItems > 0) expectedItems else keyProj.count().max(1L)
    val bf = buildLongBloom(keyProj, "__build_key", n, fpp)
    probe
      .filter(mightContain(bf, col(probeKey)))
      .join(keyProj.distinct(), col(probeKey) === col("__build_key"), "left_semi")
  }
}
