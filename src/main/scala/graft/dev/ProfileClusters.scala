package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: breaks down dedup_clusters cost — minhash pair time, pair
  * count, and per-round label-propagation time at the given SF dir.
  */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-clusters")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = graft.io.Tables.documents(spark, sf)
    val pairs = graft.dedup.Dedup.minhashDedup(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("minhash pairs materialize")(println(s"pairs = ${pairs.count()}"))
    timed("dupClusters on cached pairs") {
      println(s"labels = ${graft.dedup.Dedup.dupClusters(pairs).count()}")
    }
    spark.catalog.clearCache()
    timed("dupClusters cold (incl. minhash)") {
      println(s"labels = ${graft.dedup.Dedup.dupClusters(
        graft.dedup.Dedup.minhashDedup(docs)).count()}")
    }
    spark.stop()
  }
}
