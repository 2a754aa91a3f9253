package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-STAGE metric attribution of the shipped q_link_pred at
  * an arbitrary scale dir — written for the round-11 sf1.0 postmortem,
  * where the end-to-end spill counter read ~250 GB/run but could not say
  * WHICH stage spilled (the adaptive pair-exchange fix removed none of
  * it, so the spiller is not the pair aggregate). Prints, per completed
  * stage: wall/task time, shuffle read/write bytes, and memory/disk
  * spill, sorted by spill, with the stage's callsite name.
  *
  * Usage: runMain graft.dev.ProfileLinkPredStages [sfDir] [runs] [query]
  * (third arg generalizes the tool to ANY SparkEntry query — added for
  * the round-12 dedup_cosine_pairs postmortem.)
  */
object ProfileLinkPredStages {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("scale_fixtures/sf1.0")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val queryName = args.lift(2).getOrElse("q_link_pred")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-linkpred-stages")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(id: Int, name: String, taskS: Double, memSpill: Long,
                        diskSpill: Long, shRead: Long, shWrite: Long,
                        rows: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        stages.add(St(si.stageId, si.name.takeWhile(_ != '\n').take(120),
          m.executorRunTime / 1e3, m.memoryBytesSpilled, m.diskBytesSpilled,
          m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.outputMetrics.recordsWritten))
      }
    })

    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // The listener bus is async: stage-completed events from a finished
    // action can still be in flight when the action returns, so reading
    // or clearing `stages` immediately would mis-attribute trailing
    // stages across runs. LiveListenerBus.waitUntilEmpty() is
    // private[spark] (public in bytecode) — reflection, with a sleep
    // fallback if the accessor shape ever changes.
    def drainListenerBus(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
        ()
      } catch { case scala.util.control.NonFatal(_) => Thread.sleep(1000) }

    val li = graft.io.Tables.lineitem(spark, sf)
    drain(li.groupBy("l_orderkey").count()) // warmup

    val q = graft.SparkEntry.queries(queryName)
    for (r <- 1 to runs) {
      drainListenerBus() // flush any events still in flight from run r-1
      stages.clear()
      val t0 = System.nanoTime()
      drain(q(spark, sf))
      val wall = (System.nanoTime() - t0) / 1e9
      drainListenerBus() // this run's trailing stage events
      println(f"%nrun $r: $wall%.1f s wall — stages by spill:")
      import scala.jdk.CollectionConverters._
      val sts = stages.asScala.toVector.sortBy(s => -(s.memSpill + s.diskSpill))
      for (s <- sts.take(12)) {
        println(f"  stage ${s.id}%4d task=${s.taskS}%8.1fs memSpill=${s.memSpill / (1L << 20)}%8dMB diskSpill=${s.diskSpill / (1L << 20)}%7dMB shRead=${s.shRead / (1L << 20)}%7dMB shWrite=${s.shWrite / (1L << 20)}%7dMB  ${s.name}")
      }
      val totSpill = sts.map(s => s.memSpill + s.diskSpill).sum
      println(f"  TOTAL spill (mem+disk): ${totSpill / (1L << 30)}%d GB across ${sts.size} stages")
    }
    spark.stop()
  }
}
