package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the q_hyperanf output relation is a literal curve (the
  * rounds run eagerly under checkpoints), so this prints the plan of
  * ONE register-MAX round — the stage that actually scales.
  */
object ExplainHanfStep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.io.Tables.lineitem(spark, sfDir)
    val edges = graft.analytics.Baskets
      .coOccurrenceCounts(li, "l_orderkey", "l_partkey")
      .select(col("item_a"), col("item_b"))
    val e = graft.analytics.GraphEdges
      .symmetricDistinct(edges, "item_a", "item_b", canonical = true)
    val regs = graft.Caching.checkpointed(
      graft.analytics.HyperAnf.registers0(
        e.select(col("src").as("node")).distinct()))
    println("========== hyperanf step (one register-MAX round) ==========")
    graft.analytics.HyperAnf.step(regs, e).explain("formatted")
    println("========== hyperanf nf estimate ==========")
    graft.analytics.HyperAnf.nfEstimate(regs, 0).explain("formatted")
    spark.stop()
  }
}
