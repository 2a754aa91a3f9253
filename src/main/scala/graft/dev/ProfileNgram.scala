package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.io.Tables
import graft.text.TextOps

/** Dev: stage-by-stage timing of the ngramJaccard pipeline. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val documents = Tables.documents(spark, sfDir)
    val threshold = 0.5

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val grams = documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.wordShingles(col("toks"), 3).as("grams"))
      .select(col("doc_id"),
        array_distinct(transform(col("grams"), g => xxhash64(g))).as("grams"))
      .select(col("doc_id"), col("grams"), size(col("grams")).as("n_grams"))
      .persist()
    t("grams count")(grams.count())
    val inv = grams.select(col("doc_id"), col("n_grams"), explode(col("grams")).as("gram"))
      .persist()
    t("inv count")(inv.count())
    val dfs = inv.groupBy("gram").agg(count(lit(1)).as("df")).persist()
    t("dfs count")(dfs.count())
    val prefixLen = col("n_grams") - ceil(col("n_grams") * threshold) + 1
    val prefixes = inv.join(dfs, "gram")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(asc("df"), asc("gram"))))
      .filter(col("rn") <= prefixLen)
      .select("doc_id", "gram", "n_grams")
      .persist()
    t("prefixes count")(prefixes.count())
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n_grams") >= col("a.n_grams") * threshold &&
          col("a.n_grams") >= col("b.n_grams") * threshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    t("cand count")(println("candidates: " + cand.count()))
    val full = t("full pipeline")(
      Dedup.ngramJaccard(documents, threshold = 0.5).count())
    println("pairs: " + full)
    spark.stop()
  }
}
