package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: A/B the co-occurrence edge-build formulations feeding the
  * graph trio — the bench shows the build (not the graph operators) is
  * the trio's dominant repeated cost.
  */
object ProfileEdgeBuild {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-edge-build")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Unit): Unit = {
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${xs.map(x => f"$x%.2f").mkString(", ")}")
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val li = graft.io.Tables.lineitem(spark, sf)
    drain(li.groupBy("l_orderkey").count()) // warmup

    timed("scan only (2 cols, noop)") {
      drain(li.select(col("l_orderkey"), col("l_partkey")))
    }
    timed("A current: collect_set groupBy") {
      drain(li.select(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(array_sort(collect_set(col("l_partkey"))).as("items"))
        .filter(size(col("items")).between(2, 4096)))
    }
    timed("B distinct then collect_list") {
      drain(li.select(col("l_orderkey"), col("l_partkey")).distinct()
        .groupBy("l_orderkey")
        .agg(array_sort(collect_list(col("l_partkey"))).as("items"))
        .filter(size(col("items")).between(2, 4096)))
    }
    timed("A full edges (current coOccurrenceEdges)") {
      drain(graft.analytics.Baskets.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))
    }
    timed("C self-join edges: distinct + equi-join + distinct") {
      val items = li.select(col("l_orderkey").as("b"), col("l_partkey").as("i")).distinct()
      drain(items.as("a").join(items.as("x"),
          col("a.b") === col("x.b") && col("a.i") < col("x.i"))
        .select(col("a.i").as("item_a"), col("x.i").as("item_b"))
        .distinct())
    }
    timed("D pairs via collect_set, distinct fused into pair-count agg") {
      // distinct(edge) expressed as groupBy count>=1 — same shuffle as
      // distinct, just checking agg overhead difference
      drain(graft.analytics.Baskets
        .coOccurrencePairs(li, "l_orderkey", "l_partkey")
        .groupBy("item_a", "item_b").agg(count(lit(1)))
        .select("item_a", "item_b"))
    }
    spark.stop()
  }
}
