package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev probe: report the ACTUAL partition counts of the codec passes —
  * the mm_image_* corpora must not serialize onto one core because the
  * documents scan is a single parquet split (round-9 fix: codecIds
  * repartition). NOT part of the shipped library.
  */
object ExplainCodecParallelism {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.documents(spark, sfDir)
    println(s"documents scan partitions: ${docs.rdd.getNumPartitions}")
    val pngs = graft.multimodal.Multimodal.packSyntheticPngs(docs)
    println(s"png corpus partitions: ${pngs.rdd.getNumPartitions}")
    val hashes = graft.multimodal.Multimodal.imageAHashes(pngs)
    println(s"ahash partitions: ${hashes.rdd.getNumPartitions}")
    val t0 = System.nanoTime()
    val v = graft.multimodal.Multimodal.jpegVerdicts(docs)
    println(s"jpeg verdict rows: ${v.count()}  " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    spark.stop()
  }
}
