package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analytics (association-rule mining's
  * counting core — Agrawal & Srikant's support/lift, VLDB'94): which
  * items appear in the same basket more often than independence predicts.
  *
  * Scale shape: the only quadratic step is the per-basket item self-join,
  * and baskets are SMALL (a TPC-H order has ~4 parts; a retail basket
  * ~20), so the join output is Σ|basket|²/2 — linear in baskets with a
  * small constant, shuffled on the basket key where the data already
  * lives. One hash agg ranks the pairs; the support threshold prunes the
  * long tail BEFORE the item-count joins. Lift is exact integer counts
  * with one final IEEE division, so results hash-match any engine.
  */
object Baskets {

  /** (item_a, item_b, c_pair, lift) for item pairs co-occurring in at
    * least `minSupport` baskets, top `k` by lift (ties broken on the
    * pair), from a (basket, item) relation.
    */
  def pairLift(basketItems: DataFrame, basketCol: String, itemCol: String,
               minSupport: Long = 2L, k: Int = 100): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(k >= 1, "k must be >= 1")
    val items = basketItems.select(col(basketCol), col(itemCol)).distinct()
    val nBaskets = items.agg(countDistinct(col(basketCol)).as("n_baskets"))
    val itemCnt = items.groupBy(itemCol).agg(count(lit(1)).as("c_item"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col(s"a.$basketCol") === col(s"b.$basketCol") &&
          col(s"a.$itemCol") < col(s"b.$itemCol"))
      .groupBy(col(s"a.$itemCol").as("item_a"), col(s"b.$itemCol").as("item_b"))
      .agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minSupport)
    pairs
      .join(itemCnt.select(col(itemCol).as("item_a"), col("c_item").as("c_a")), "item_a")
      .join(itemCnt.select(col(itemCol).as("item_b"), col("c_item").as("c_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      // lift = P(ab)/(P(a)P(b)) = c_ab·N / (c_a·c_b): exact longs, ONE division
      .select(col("item_a"), col("item_b"), col("c_pair"),
        ((col("c_pair") * col("n_baskets")).cast("double") /
          (col("c_a") * col("c_b")).cast("double")).as("lift"))
      .orderBy(desc("lift"), col("item_a"), col("item_b"))
      .limit(k)
  }

  /** Distinct co-occurrence edges (item_a < item_b) — the input graph for
    * [[Triangles.triangleCount]] and other graph statistics.
    */
  def coOccurrenceEdges(basketItems: DataFrame, basketCol: String,
                        itemCol: String): DataFrame = {
    val items = basketItems.select(col(basketCol), col(itemCol)).distinct()
    items.as("a")
      .join(items.as("b"),
        col(s"a.$basketCol") === col(s"b.$basketCol") &&
          col(s"a.$itemCol") < col(s"b.$itemCol"))
      .select(col(s"a.$itemCol").as("item_a"), col(s"b.$itemCol").as("item_b"))
      .distinct()
  }
}
