package graft.dev

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only: per-query optimization profiler (round 13). Runs each named
  * query REPS times through the noop sink exactly as Bench does (same
  * session config), printing per-run wall seconds plus a per-JOB
  * breakdown (wall, task-time sum, shuffle read/write MB, spill) for the
  * LAST run — the measurement loop of guide §1: find which job/stage of
  * a query's plan owns the time before touching it.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.dev.ProfileQ q1 q2 ...
  * REPS via SPARK_GRAFT_PROFILE_REPS (default 3).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("profile-q")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.cleaner.referenceTracking.blocking", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // job-level metrics, keyed by jobId
    final case class Job(desc: String, start: Long, var end: Long = 0L,
                         var taskMs: Long = 0L, var shufReadB: Long = 0L,
                         var shufWriteB: Long = 0L, var spillB: Long = 0L,
                         var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(e.jobId, Job(d, e.time))
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.get(e.stageId)
        val j = jobs.get(jid)
        val m = e.taskMetrics
        if (j != null && m != null) j.synchronized {
          j.taskMs += m.executorRunTime
          j.shufReadB += m.shuffleReadMetrics.totalBytesRead
          j.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          j.spillB += m.memoryBytesSpilled + m.diskBytesSpilled
          j.tasks += 1
        }
      }
    })

    def drain(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sf)
        .write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      s
    }
    // untimed warmup (JVM/codegen/session memos)
    drain("dim_supplier")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_triangles")
    names.foreach { n =>
      val times = (1 to reps).map { i =>
        if (i == reps) { jobs.clear(); stageToJob.clear() }
        drain(n)
      }
      println(f"== $n: " + times.map(t => f"$t%.2f").mkString(", ") +
        f"  (min ${times.min}%.2f)")
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      js.foreach { case (id, j) =>
        val wall = (j.end - j.start) / 1e3
        if (wall > 0.02)
          println(f"  job $id%3d ${wall}%6.2fs task=${j.taskMs / 1e3}%7.1fs " +
            f"t=${j.tasks}%4d sr=${j.shufReadB / 1e6}%8.1fMB " +
            f"sw=${j.shufWriteB / 1e6}%8.1fMB sp=${j.spillB / 1e6}%6.1fMB " +
            j.desc.take(60))
      }
      val totWall = js.map(j => (j._2.end - j._2.start) / 1e3).sum
      println(f"  jobs=${js.size} jobWallSum=$totWall%.2fs")
    }
    spark.stop()
  }
}
