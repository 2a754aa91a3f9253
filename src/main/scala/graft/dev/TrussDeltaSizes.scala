package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 13): per-round peel-delta sizes of the k=4 truss on
  * the co-bought graph — dropped-edge count and wedge-candidate count —
  * to size the bounded-delta gate against reality. NOT shipped.
  */
object TrussDeltaSizes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val items = graft.io.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e0 = graft.Caching.materialize(items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct())
    val thr = 2
    var cur = graft.Caching.checkpointed(
      e0.join(graft.analytics.Triangles.support(e0), Seq("u", "v")))
    println(s"round 0: |E|=${cur.count()}")
    var r = 0
    var done = false
    while (!done && r < 15) {
      r += 1
      val dropped = cur.filter(col("sup") < thr)
      val keep = cur.filter(col("sup") >= thr)
      val dCount = dropped.count()
      if (dCount == 0) { done = true; println(s"round $r: fixpoint") }
      else {
        val adj = cur.select(col("u").as("a"), col("v").as("b"))
          .unionByName(cur.select(col("v").as("a"), col("u").as("b")))
        val wedges = adj.join(dropped.select("u", "v").hint("broadcast"),
            col("a") === col("u"))
          .filter(col("b") =!= col("v")).count()
        println(s"round $r: dropped=$dCount wedges=$wedges keep=${keep.count()}")
        // full recompute to advance exactly (probe only; slow but exact)
        val kept = keep.select("u", "v")
        val next = graft.Caching.checkpointed(
          kept.join(graft.analytics.Triangles.support(kept), Seq("u", "v"), "left")
            .select(col("u"), col("v"),
              coalesce(col("sup"), lit(0L)).as("sup")))
        graft.Caching.releaseCheckpoint(cur)
        cur = next
      }
    }
    spark.stop()
  }
}
