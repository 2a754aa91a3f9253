package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: how many threshold rounds the k=4 truss peel needs to
  * reach its fixpoint on the co-bought graph at a given scale factor —
  * establishes the idempotence margin the BOUNDED q_ktruss_converged
  * DuckDB oracle must unroll (the engine iterates to fixpoint; equal
  * COUNT implies equal SET under the monotone shrink). NOT part of the
  * shipped library.
  */
object ExplainTrussRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val items = graft.io.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e0raw = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("item_a"), col("b.l_partkey").as("item_b"))
      .distinct()
    val e0 = graft.Caching.materialize(e0raw)
    val fix = graft.analytics.Triangles.kTrussConverged(
      e0, "item_a", "item_b", k = 4, canonical = true).count()
    println(s"fixpoint: $fix edges")
    var r = 0
    var m = -1L
    while (m != fix && r < 30) {
      r += 1
      m = graft.analytics.Triangles.kTruss(
        e0, "item_a", "item_b", k = 4, rounds = r, canonical = true).count()
      println(s"bounded rounds=$r: $m edges")
    }
    println(s"convergence depth at $sfDir: $r threshold rounds")
    spark.stop()
  }
}
