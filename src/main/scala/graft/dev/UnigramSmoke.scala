package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only smoke runner for the unigram trainer. */
object UnigramSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    import graft.text.Unigram._
    trainVocab(docs).orderBy("piece")
      .write.mode("overwrite").parquet("/tmp/uni_spark_train")
    encodeStats(docs).orderBy("doc_id")
      .write.mode("overwrite").parquet("/tmp/uni_spark_encode")
    fertilityBySource(docs).orderBy("source")
      .write.mode("overwrite").parquet("/tmp/uni_spark_fert")
    spark.stop()
  }
}
