package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 13): what sizeInBytes estimate does a
  * localCheckpointed relation carry — and does materialize-then-
  * checkpoint give the honest cached size instead? Decides the fix for
  * the sym-memo broadcast regression. NOT shipped.
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val co = graft.Caching.checkpointed(
      graft.analytics.Baskets.coOccurrenceCounts(
        graft.io.Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey"))
    val half = co.select(col("item_a").cast("long").as("item_a"),
      col("item_b").cast("long").as("item_b"))
    val sym = half.union(half.select(col("item_b").as("item_a"),
      col("item_a").as("item_b")))
    println(s"co rows=${co.count()}")
    def stats(tag: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(f"$tag%-28s sizeInBytes=${df.queryExecution.optimizedPlan.stats.sizeInBytes}")
    stats("sym (lazy union)", sym)
    val cpPlain = graft.Caching.checkpointed(sym)
    stats("checkpointed(sym)", cpPlain)
    val cached = graft.Caching.materialize(sym)
    stats("materialized(sym)", cached)
    val cpStats = graft.Caching.checkpointed(cached)
    cached.unpersist(false)
    stats("checkpointed(materialized)", cpStats)
    // join-side choice: tiny frontier vs each sym flavor
    val frontier = spark.range(5).select(col("id").as("item_a"))
    def strategy(tag: String, e: org.apache.spark.sql.DataFrame): Unit = {
      val p = e.join(frontier, "item_a").queryExecution.executedPlan.toString
      val bcast =
        if (p.contains("BroadcastHashJoin")) {
          // which side is build? crude: does the broadcast subtree contain Range?
          if (p.contains("BroadcastExchange") &&
            p.split("BroadcastExchange")(1).contains("Range")) "broadcast-frontier"
          else "broadcast-OTHER-side"
        } else "no-broadcast"
      println(f"$tag%-28s $bcast")
    }
    strategy("join w/ checkpointed(sym)", cpPlain)
    strategy("join w/ cp(materialized)", cpStats)
    spark.stop()
  }
}
