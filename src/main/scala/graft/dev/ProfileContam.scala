package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage timings for dedup_contamination. */
object ProfileContam {
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
    val docs = graft.io.Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val eval = docs.filter(col("doc_id") % 50 === 0)

    // replicate gramHashes stages
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("toks"))
    def grams(df: org.apache.spark.sql.DataFrame) =
      toks(df).select(col("doc_id"), graft.dedup.Dedup.wordShingles(col("toks"), 3).as("grams"))
    def hashes(df: org.apache.spark.sql.DataFrame) =
      grams(df).select(col("doc_id"), explode(col("grams")).as("gram"))
        .select(col("doc_id"), conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("hv"))

    timed("train toks count")(println(toks(train).count()))
    timed("train grams count")(println(grams(train).count()))
    timed("train explode count")(println(grams(train).select(col("doc_id"), explode(col("grams")).as("g")).count()))
    timed("train hashes count")(println(hashes(train).count()))
    timed("full contamination")(println(
      graft.dedup.Dedup.contamination(train, eval, minShared = 2).count()))
    spark.stop()
  }
}
