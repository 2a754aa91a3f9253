package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage timings for embed_dbscan. */
object ProfileDbscan {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = graft.io.Tables.embeddings(spark, sf)
    timed("nearDupPairs count")(println(
      graft.similarity.Ann.nearDupPairs(emb, 0.35).count()))
    spark.catalog.clearCache()
    timed("full dbscan")(println(
      graft.similarity.Dbscan.dbscan(emb).count()))
    spark.catalog.clearCache()
    timed("full dbscan again (warm)")(println(
      graft.similarity.Dbscan.dbscan(emb).count()))
    spark.stop()
  }
}
