package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: stage timings + cardinalities for dedup_cosine_pairs. */
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
    val toks = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("raw"))
      .filter(col("raw") =!= "")
      .select(col("doc_id"), lower(col("raw")).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), graft.dedup.Dedup.md5Base60(col("token")).as("hv"), col("tf"))
    val dfreq = tf.groupBy("hv").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val wp = tf.join(dfreq, "hv").crossJoin(broadcast(n))
      .select(col("doc_id"), col("hv"),
        floor(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")) * 1e6 + 0.5)
          .cast("long").as("w_micro"))
      .filter(col("w_micro") > 0)
    val norms = wp.groupBy("doc_id").agg(sum(col("w_micro") * col("w_micro")).as("norm2"))
    val feats = wp.join(norms, "doc_id")
      .select(col("doc_id"), col("hv"),
        floor(col("w_micro").cast("double") * 1e6 /
          sqrt(col("norm2").cast("double")) + 0.5).cast("long").as("wn"))
      .filter(col("wn") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("feats")(println("feats rows: " + feats.count()))
    val maxw = feats.groupBy("hv").agg(max(col("wn")).as("maxw"))
    val tailWin = Window.partitionBy("doc_id")
      .orderBy(col("maxw").desc, col("hv").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prefixes = feats.join(maxw, "hv")
      .withColumn("tail_bound", sum(col("wn") * col("maxw")).over(tailWin))
      .filter(col("tail_bound") >= tPico)
      .select("doc_id", "hv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("prefixes")(println("prefix rows: " + prefixes.count()))
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.hv") === col("b.hv") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("candidates")(println("cand pairs: " + cand.count()))
    val fa = feats.select(col("doc_id").as("doc_a"), col("hv"), col("wn").as("wa"))
    val fb = feats.select(col("doc_id").as("doc_b"), col("hv"), col("wn").as("wb"))
    timed("verify")(println("pairs: " + cand
      .join(fa, "doc_a").join(fb, Seq("doc_b", "hv"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("wa") * col("wb")).as("dot_pico"))
      .filter(col("dot_pico") >= tPico).count()))
    timed("full op")(println(
      graft.dedup.CosinePairs.cosinePairs(docs, threshold).count()))
    spark.stop()
  }
}
