package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: breaks down the graph-trio cost — edge-build time and row
  * count, then each downstream operator with the edge relation already
  * materialized, so the verdict's "edge build vs operator" split is
  * measured, not guessed.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-graph")
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
    // warmup
    drain(li.groupBy("l_orderkey").count())

    // edge-build internals, step-timed
    val arrays = timed("  eb.groupBy collect_set (noop)") {
      val a = li.select(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(array_sort(collect_set(col("l_partkey"))).as("items"))
        .filter(size(col("items")).between(2, 4096))
      drain(a); a
    }
    timed("  eb.pairs explode (noop)") {
      drain(graft.analytics.Baskets.coOccurrencePairs(li, "l_orderkey", "l_partkey"))
    }
    val edges = graft.analytics.Baskets.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("edge build (materialize persist)") { println(s"edges: ${edges.count()}") }
    timed("triangleCount on materialized edges") {
      drain(graft.analytics.Triangles.triangleCount(edges, "item_a", "item_b"))
    }
    // --- manual replay of triangleCount's internals, step-timed ---
    locally {
      import org.apache.spark.storage.StorageLevel
      val e = timed("  tc.e canonical+distinct+persist") {
        val x = edges.select(col("item_a").cast("long").as("u"), col("item_b").cast("long").as("v"))
          .filter(col("u") =!= col("v"))
          .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
          .distinct().persist(StorageLevel.MEMORY_AND_DISK)
        x.count(); x
      }
      val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val withDegs = e
        .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      val oriented = timed("  tc.oriented persist") {
        val x = withDegs.select(
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
            .otherwise(col("v")).as("src"),
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
            .otherwise(col("u")).as("dst"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        x.count(); x
      }
      val adj = timed("  tc.adj persist") {
        val x = oriented.groupBy("src")
          .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        x.count(); x
      }
      timed("  tc.final double-join+intersect+agg") {
        drain(oriented
          .join(adj.select(col("src"), col("nbrs").as("src_nbrs")), "src")
          .join(adj.select(col("src").as("dst"), col("nbrs").as("dst_nbrs")),
            Seq("dst"), "left")
          .select(size(array_intersect(col("src_nbrs"),
            coalesce(col("dst_nbrs"), array().cast("array<long>")))).as("tri"))
          .agg(coalesce(sum(col("tri")), lit(0L)).cast("long").as("n_triangles")))
      }
      e.unpersist(); oriented.unpersist(); adj.unpersist()
    }
    timed("clusteringCoefficient on materialized edges") {
      drain(graft.analytics.Triangles.clusteringCoefficient(edges, "item_a", "item_b"))
    }
    spark.catalog.clearCache()
    timed("pairLift end-to-end") {
      drain(graft.analytics.Baskets.pairLift(li, "l_orderkey", "l_partkey"))
    }
    spark.stop()
  }
}
