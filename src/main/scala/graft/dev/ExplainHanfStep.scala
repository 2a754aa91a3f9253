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
    println("========== systolic stepDelta (round-1 plan) ==========")
    val (r1, d1) = graft.analytics.HyperAnf.stepDelta(regs, regs, e)
    r1.explain("formatted")
    println("========== systolic frontier shrinkage per round ==========")
    val eM = graft.Caching.materialize(e)
    val total = regs.count()
    var cur = regs
    var delta = regs
    println(s"round 0: state=$total frontier=$total (edge-join input rows)")
    for (t <- 1 to 6) {
      val (nr, nd) = graft.analytics.HyperAnf.stepDelta(cur, delta, eM)
      val nextR = graft.Caching.checkpointed(nr)
      val nextD = graft.Caching.checkpointed(nd)
      if (!(delta eq cur)) graft.Caching.releaseCheckpoint(delta)
      if (!(cur eq regs)) graft.Caching.releaseCheckpoint(cur)
      cur = nextR; delta = nextD
      val st = cur.count(); val fr = delta.count()
      println(s"round $t: state=$st frontier=$fr " +
        s"(${"%.1f".format(100.0 * fr / st)}% of registers still flowing)")
    }
    spark.stop()
  }
}
