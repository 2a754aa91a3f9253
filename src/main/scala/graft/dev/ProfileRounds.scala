package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: time the per-round-persisted iterative graph queries
  * (q_label_prop, q_bfs_hops) exactly as Bench runs them — full
  * per-query isolation, clearCache between runs.
  */
object ProfileRounds {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-rounds")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    for (name <- Seq("q_label_prop", "q_bfs_hops", "q_label_prop", "q_bfs_hops", "q_label_prop", "q_bfs_hops")) {
      val t0 = System.nanoTime()
      drain(graft.SparkEntry.queries(name)(spark, sf))
      spark.catalog.clearCache()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
