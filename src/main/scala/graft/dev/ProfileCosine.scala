package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.CosinePairs

/** Dev-only: stage timings + cardinalities for dedup_cosine_pairs —
  * built ON the production stages (CosinePairs.features/prefixFeatures),
  * never a copy, so the reported cardinalities always describe the
  * shipped plan.
  */
object ProfileCosine {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.9
    val tPico = math.round(threshold * 1e12)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.io.Tables.documents(spark, sf)
    val feats = CosinePairs.features(docs)
    timed("feats")(println("feats rows: " + feats.count()))
    val prefixes = CosinePairs.prefixFeatures(feats, tPico)
    timed("prefixes")(println("prefix rows: " + prefixes.count()))
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.hv") === col("b.hv") && col("a.doc_id") < col("b.doc_id") &&
          col("a.tn") * col("b.tn") >= tPico)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    timed("candidates")(println("cand pairs: " + cand.count()))
    timed("full op")(println(
      CosinePairs.cosinePairs(docs, threshold).count()))
    spark.stop()
  }
}
