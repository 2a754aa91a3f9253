package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level cost breakdown of Breadth4.linkPrediction at
  * sf0.1. Round-6 finding: the default pre-shuffle partial hash-agg over
  * 148M wedge rows into 33.6M pair groups spills (64 s); exchanging
  * first on a packed single-long pair key runs the same aggregate in
  * 16 s. This profiler now times the shipped implementation end-to-end
  * and prints its final plan so the anti-join strategy (AQE broadcast vs
  * SMJ) is visible.
  */
object ProfileLinkPred {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-linkpred")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val li = graft.io.Tables.lineitem(spark, sf)
    drain(li.groupBy("l_orderkey").count()) // warmup

    val edges = timed("edge build (canonical distinct, cached)") {
      val e = graft.Caching.checkpointed(
        graft.analytics.Baskets.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))
      println(s"  edges: ${e.count()}")
      e
    }

    val full = graft.analytics.Breadth4.linkPrediction(edges, "item_a", "item_b")
    timed("full linkPrediction (shipped)") { drain(full) }
    timed("full linkPrediction (2nd run)") { drain(full) }
    println(full.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
