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
