package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 13): A/B the graph operators' OLD per-query
  * symmetrize-and-materialize path (canonical = true) against the NEW
  * shared pre-symmetrized relation (symmetric = true) to isolate the
  * bench regression on q_harmonic / q_betweenness / q_hyperball /
  * q_bfs_hops. NOT shipped.
  */
object SymPathProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val co = graft.Caching.checkpointed(
      graft.analytics.Baskets.coOccurrenceCounts(
        graft.io.Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey")
        .select(col("item_a"), col("item_b")))
    val half = co.select(col("item_a").cast("long").as("item_a"),
      col("item_b").cast("long").as("item_b"))
    val sym = graft.Caching.checkpointed(
      half.union(half.select(col("item_b").as("item_a"),
        col("item_a").as("item_b"))))
    println(s"sym parts=${sym.rdd.getNumPartitions} rows=${sym.count()}")
    // construction runs the per-round checkpoints — time it WITH the
    // final materialization, exactly as Bench.materialize does
    def drain(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc(); s
    }
    import graft.analytics._
    // per-job wall/task/parallelism for the LAST rep of each arm
    final case class J(start: Long, var end: Long = 0L, var taskMs: Long = 0L,
                       var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val s2j = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, J(e.time)); e.stageIds.foreach(s => s2j.put(s, e.jobId))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val j = jobs.get(s2j.get(e.stageId)); val m = e.taskMetrics
        if (j != null && m != null) j.synchronized {
          j.taskMs += m.executorRunTime; j.tasks += 1
        }
      }
    })
    def run(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { i =>
        if (i == 3) { jobs.clear(); s2j.clear() }
        drain(mk)
      }
      println(f"$tag%-34s " + ts.map(t => f"$t%.2f").mkString(", "))
      import scala.jdk.CollectionConverters._
      jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, j) =>
        val w = (j.end - j.start) / 1e3
        if (w > 0.15)
          println(f"    job $id%3d ${w}%5.2fs task=${j.taskMs / 1e3}%6.1fs t=${j.tasks}%3d")
      }
    }
    run("harmonic OLD canonical",
      () => Harmonic.landmarkHarmonic(co, "item_a", "item_b", canonical = true))
    run("harmonic NEW symmetric",
      () => Harmonic.landmarkHarmonic(sym, "item_a", "item_b", symmetric = true))
    run("bfs OLD canonical",
      () => Bfs.hubDistances(co, "item_a", "item_b", canonical = true))
    run("bfs NEW symmetric",
      () => Bfs.hubDistances(sym, "item_a", "item_b", symmetric = true))
    spark.stop()
  }
}
