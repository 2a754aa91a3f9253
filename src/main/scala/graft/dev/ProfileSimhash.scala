package graft.dev

import org.apache.spark.sql.SparkSession

import graft.dedup.Dedup
import graft.io.Tables

/** Dev: standalone timing for simhashDedup. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    t("sketch")(Dedup.simhashSketch(docs).count())
    spark.catalog.clearCache()
    t("dedup run1")(Dedup.simhashDedup(docs).count())
    spark.catalog.clearCache()
    t("dedup run2")(Dedup.simhashDedup(docs).count())
    spark.stop()
  }
}
