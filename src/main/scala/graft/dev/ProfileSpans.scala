package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage timings for dedup_spans / duplicatedSpans. */
object ProfileSpans {
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
    val toks = docs.select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("toks"))
    val spansArr = toks.select(col("doc_id"),
      graft.dedup.Dedup.wordShingles(col("toks"), 15).as("spans"))

    timed("toks count")(println(toks.count()))
    timed("spans array count")(println(spansArr.count()))
    timed("explode count (fused)")(println(
      spansArr.select(col("doc_id"), explode(col("spans")).as("s")).count()))
    val cached = spansArr.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("cache fill")(println(cached.count()))
    timed("explode count (from cache)")(println(
      cached.select(col("doc_id"), explode(col("spans")).as("s")).count()))
    timed("hash+df+join (from cache)") {
      val spans = cached.select(col("doc_id"), explode(col("spans")).as("span"))
        .select(col("doc_id"), graft.dedup.Dedup.md5Base60(col("span")).as("hv"))
      val sdf = spans.groupBy("hv").agg(count(lit(1)).as("span_df"))
      println(spans.join(sdf, "hv").groupBy("doc_id")
        .agg(count(lit(1)), sum(when(col("span_df") >= 2, 1L).otherwise(0L))).count())
    }
    timed("full duplicatedSpans (current impl)")(println(
      graft.dedup.Dedup.duplicatedSpans(docs).count()))
    spark.stop()
  }
}
