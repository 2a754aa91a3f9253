package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) handles
  * most runtime skew; these helpers are for the cases AQE can't fix —
  * a single hot key whose *build* side still lands in one task, or skewed
  * aggregation where the first shuffle itself is the bottleneck.
  */
object SkewJoin {

  /** Salted inner equi-join: the large/skewed left side gets a
    * deterministic per-row salt in [0, nSalts); the right side is
    * replicated nSalts times; the join key becomes (key, salt), spreading
    * each hot key over nSalts tasks. Row-multiset result is identical to
    * the plain inner join (each left row matches exactly the replica
    * carrying its salt).
    *
    * Cost model: right side payload is duplicated nSalts× through the
    * shuffle — use for moderate right sides; a tiny right side should just
    * broadcast, a huge one should rely on AQE splitting.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 nSalts: Int = 16): DataFrame = {
    require(nSalts > 0)
    // whole-row hash → deterministic, uniformly spread salt
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(nSalts)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedLeft.join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop(replicatedRight(key)).drop("__salt")
  }

  /** Size-dispatched block join for candidate-pair generation (blocked
    * record linkage, fuzzy self-joins): both sides share a
    * low-cardinality blocking key, and the rows-out is quadratic per
    * block while the bytes-in is tiny — the worst shape for both a
    * plain hash join (≤|blocks| tasks) and AQE (which coalesces by
    * *input* bytes and would serialize the downstream per-pair
    * compute).
    *
    * Dispatch, decided from Catalyst's plan statistics:
    *  - candidate side ≤ `broadcastBudgetBytes` → broadcast it, with
    *    the stream side explicitly spread to default parallelism first
    *    (a broadcast join inherits the stream side's partitioning, and
    *    a single parquet split would otherwise run the quadratic
    *    filter on one core);
    *  - larger → salted equi-join on (key, salt): bounded nSalts×
    *    replication through the shuffle instead of an unbounded
    *    broadcast, each block spread over nSalts tasks. At corpus
    *    scale the shuffled bytes are large enough that AQE sizes real
    *    parallelism from them.
    *
    * The budget default (64 MB) is deliberately above
    * `autoBroadcastJoinThreshold`: a candidate side of tens of MB is
    * still a safe executor broadcast, and the thing this guards
    * against is the multi-GB corpus-sized broadcast that OOMs at 100×.
    */
  def dispatchedBlockJoin(stream: DataFrame, cand: DataFrame, key: String,
                          nSalts: Int = 16,
                          broadcastBudgetBytes: Long = 64L << 20): DataFrame = {
    val candSize = cand.queryExecution.optimizedPlan.stats.sizeInBytes
    if (candSize <= BigInt(broadcastBudgetBytes)) {
      val par = stream.sparkSession.sparkContext.defaultParallelism
      stream.repartition(par).join(broadcast(cand), key)
    } else saltedJoin(stream, cand, key, nSalts)
  }

  /** Two-phase salted aggregation for skewed group keys: partial
    * count/sum per (key, salt), then final re-aggregation per key. Spark's
    * hash aggregate already does map-side partial combine; this adds an
    * extra *shuffled* partial stage for the pathological case where even
    * combined partials of one key overwhelm a single reducer.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                nSalts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(struct(df.columns.map(col): _*)), lit(nSalts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n_rows"), sum("__s").as(s"sum_$valueCol"))
}
