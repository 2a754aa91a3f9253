package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Methodology: results are materialized through the `noop` sink (count()
  * would let Catalyst prune the projections being measured), and one cheap
  * warmup query runs first so JVM/codegen warmup isn't billed to the first
  * measured query. Queries run in sorted-name order for stable attribution.
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and reports the
  * MINIMUM (timeit-style): this VM's noise is heavy-tailed — jstack-verified
  * driver stalls (plan-string rendering, reference-processing storms after
  * System.gc) intermittently multiply a sample 3-25× with identical executor
  * work, so the min is the faithful estimate of the operator's cost and the
  * full per-run samples are always published alongside.
  *
  * The same JSON (plus the raw per-run samples) is also written to
  * SPARK_GRAFT_BENCH_OUT (default `bench_results.json` in the CWD) — stdout
  * capture can truncate a 111-query line; the file is always whole.
  */
object Bench {

  /** Re-measure each of `names` in its OWN fresh child JVM — one query
    * per process, 3 runs each, the child's own warmup query first — and
    * return per-query (cold, warm): cold = the query's FIRST run in the
    * fresh JVM (it pays any session-memo builds — co-bought edges, hanf
    * curve — plus that query's codegen), warm = min of the later runs
    * (memos + codegen resident; the apples-to-apples number against the
    * suite, whose memos were built by earlier queries).
    *
    * One-query-per-process is the round-7 hand protocol mechanized: the
    * round-8 child ran the 6 heaviest queries INTERLEAVED in one JVM,
    * which is just a small suite (co-tenant heap/codegen pressure —
    * q_link_pred read 51 s there vs 20.5 s by hand in a true solo JVM), so
    * its numbers could not adjudicate cold-cache vs real regression.
    *
    * The child is this same main with one explicit query arg +
    * SPARK_GRAFT_ISOLATED=1, so it can never recurse; stdout/stderr
    * append to bench_isolated.log. A child failure degrades to that
    * query being absent — the suite numbers still publish.
    */
  private def runIsolatedChild(names: Seq[String], sfDir: String)
      : Map[String, (Double, Double)] = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val xmx = s"-Xmx${Runtime.getRuntime.maxMemory() >> 20}m"
    names.flatMap { name =>
      try {
        val out = "bench_isolated_child.json"
        val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
          xmx, "-XX:ReservedCodeCacheSize=1g",
          "-cp", System.getProperty("java.class.path"), "graft.Bench", name))
        val pb = new ProcessBuilder(cmd: _*)
        pb.environment().put("SPARK_GRAFT_ISOLATED", "1")
        pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
        pb.environment().put("SPARK_GRAFT_BENCH_RUNS", "3")
        pb.environment().put("SPARK_GRAFT_BENCH_OUT", out)
        val logf = new java.io.File("bench_isolated.log")
        pb.redirectOutput(java.lang.ProcessBuilder.Redirect.appendTo(logf))
        pb.redirectErrorStream(true)
        System.err.println(s"[bench] isolated child: $name")
        val p = pb.start()
        if (!p.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)) {
          p.destroyForcibly()
          System.err.println(s"[bench] isolated child $name timed out"); None
        } else if (p.exitValue() != 0) {
          System.err.println(s"[bench] isolated child $name rc=${p.exitValue()}"); None
        } else {
          // parse the child's raw samples line: cold = first run, warm =
          // min of the rest (anchored to THIS query's array; the samples
          // object is flat name:[..] pairs by construction)
          val lines = scala.io.Source.fromFile(out, "UTF-8").getLines().toList
          val samplesLine = lines.find(_.startsWith("""{"metric":"samples""""))
          samplesLine.flatMap { l =>
            (("\"" + java.util.regex.Pattern.quote(name) + "\":\\[([0-9.,eE+-]+)\\]").r
              .findFirstMatchIn(l))
              .map(_.group(1).split(',').toSeq.map(_.toDouble))
          } match {
            // keep the query if ANY run succeeded: a failed cold run
            // (first-run OOM/timeout) must not discard valid warm
            // samples — warm is the apples-to-apples metric; a failed
            // run is carried as -1 in its column
            case Some(xs) if xs.exists(_ >= 0) =>
              val warmRuns = xs.tail.filter(_ >= 0)
              val warm = if (warmRuns.isEmpty) xs.head else warmRuns.min
              Some(name -> (xs.head, warm))
            case _ =>
              System.err.println(s"[bench] isolated child $name: no samples"); None
          }
        }
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] isolated child $name failed: ${e.getMessage}")
        None
      }
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    val only = args.toSeq // optional query-name filter for local iteration
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); the flag belongs in the
      // session builder (not inside a read helper) so no global conf flips
      // mid-session — see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Bound the eagerly-rendered plan-description strings (built on
      // every action and AQE update even with the UI off): deep-lineage
      // iterative plans otherwise spend driver-minutes in
      // TreeNode.generateTreeString — the BENCH_r04 10-25× sample
      // outliers. 8 KB keeps event payloads useful and the render cheap.
      .config("spark.sql.maxPlanStringLength", "8192")
      // don't serialize cleaner RPCs into the timed path: after a
      // shuffle-heavy query, the System.gc() below floods the cleaner
      // queue; blocking removal stalls subsequent job submission
      .config("spark.cleaner.referenceTracking.blocking", "false")
      // 185 queries × several codegen stages each ≫ the 100-entry
      // default class cache: interleaved passes would recompile every
      // generated class every pass (measured +1.5-3 s floor per query)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
      } finally {
        // drop any intermediates a query persisted (even on failure) and
        // collect garbage so the next timing isn't billed for this heap
        spark.catalog.clearCache()
        System.gc()
      }
    }

    def best(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }

    // warmup: pay JVM/classloading/codegen startup outside the timings
    materialize("dim_supplier")

    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      if (only.isEmpty) all else all.filter(only.contains)
    }
    // INTERLEAVED passes: run every query once per round (rounds outer)
    // rather than N back-to-back runs per query. JVM health degrades
    // slowly over a 185-query pass (codegen/class accumulation — the
    // q_item_cf samples [45.2, 18.0, 10.5] vs 3.2 s isolated); with
    // consecutive runs one bad epoch poisons ALL samples of a query,
    // interleaved the N samples land in different epochs and the min
    // survives.
    val collected = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to runs; n <- names) collected(n) = collected(n) :+ materialize(n)
    val samples = names.map { n =>
      val xs = collected(n)
      System.err.println(s"[bench] $n: ${xs.map(x => f"$x%.3f").mkString(", ")}")
      n -> xs
    }
    val results = samples.map { case (n, xs) => n -> best(xs) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"sf":"$sfDir"}"""
    val raw = samples.map { case (k, xs) =>
      "\"" + k + "\":[" + xs.mkString(",") + "]"
    }.mkString("{", ",", "}")

    // --- mechanized suite-vs-isolated adjudication (round-7 verdict #3).
    // JVM health degrades over a 270-query pass (codegen/class
    // accumulation); a query whose SUITE sample regresses may be
    // unchanged — round 7 proved it by hand-running q_link_pred in a
    // fresh JVM (29-32 s suite vs 20.5 s isolated, identical plan). That
    // adjudication is now automatic: after the suite, each of the top-N
    // heaviest queries re-runs in its OWN fresh child JVM (same
    // classpath/flags, 3 runs; warm = min of runs 2-3, cold = run 1),
    // and bench_results.json publishes the isolated + cold columns plus
    // the suite-median / isolated-warm aging ratio. Regressions should
    // be judged on the ISOLATED WARM column; an aging ratio > ~1.3
    // marks the suite number as JVM aging, not a plan change. Guarded so
    // the child (invoked with one explicit query arg +
    // SPARK_GRAFT_ISOLATED=1) never recurses.
    val isolatedN = sys.env.getOrElse("SPARK_GRAFT_ISOLATED_N", "6").toInt
    def medianOf(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      else if (ok.size % 2 == 1) ok(ok.size / 2)
      else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0
    }
    val suiteMedians = samples.map { case (n, xs) => n -> medianOf(xs) }.toMap
    val isolatedBoth: Map[String, (Double, Double)] =
      if (only.nonEmpty || sys.env.contains("SPARK_GRAFT_ISOLATED") ||
          isolatedN <= 0) Map.empty
      else {
        val top = results.filter(_._2 >= 0).sortBy(-_._2).take(isolatedN).map(_._1)
        // the parent session must release local[32] before the children
        // claim it — two 32-thread Spark JVMs would contend and the
        // isolated numbers would measure the contention
        spark.stop()
        runIsolatedChild(top, sfDir)
      }
    // warm = the plan's solo cost with session memos + codegen resident
    // (the apples-to-apples column vs the suite); cold = the first run
    // in the fresh JVM (warm + memo builds + that query's codegen). A
    // suite regression with flat warm and big cold−warm is cache
    // economics, not a plan change — the artifact now answers that
    // without a human re-deriving it.
    val isolated: Map[String, Double] = isolatedBoth.map { case (k, cw) => k -> cw._2 }
    val agingJson = isolated.toSeq.sorted.map { case (k, iso) =>
      val ratio = if (iso > 0) suiteMedians.getOrElse(k, -1.0) / iso else -1.0
      "\"" + k + "\":" + f"$ratio%.3f"
    }.mkString("{", ",", "}")
    val isolatedJson = isolated.toSeq.sorted.map { case (k, v) =>
      "\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val isolatedColdJson = isolatedBoth.toSeq.sortBy(_._1).map { case (k, cw) =>
      "\"" + k + "\":" + cw._1
    }.mkString("{", ",", "}")
    // per-query spread summary (min / median / max over the N interleaved
    // samples): regressions under ~10% are unreadable from a single point
    // estimate on this VM — the spread line makes round-over-round deltas
    // judgeable against run variance without re-deriving from the raws
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      else if (ok.size % 2 == 1) ok(ok.size / 2)
      else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0
    }
    val spread = samples.map { case (k, xs) =>
      val ok = xs.filter(_ >= 0)
      val (mn, mx) = if (ok.isEmpty) (-1.0, -1.0) else (ok.min, ok.max)
      "\"" + k + s"""\":{"min":$mn,"median":${median(xs)},"max":$mx}"""
    }.mkString("{", ",", "}")
    val isolatedLine =
      if (isolated.isEmpty) ""
      else s"""{"metric":"isolated","queries":$isolatedJson,"cold":$isolatedColdJson,"aging_ratio":$agingJson,"protocol":"one fresh JVM per query; warm=min of runs 2-3, cold=run 1 (pays memo builds)","runs":3}""" + "\n"
    Files.write(Paths.get(outPath),
      (line + "\n" + s"""{"metric":"samples","queries":$raw}""" + "\n" +
        s"""{"metric":"spread","queries":$spread}""" + "\n" + isolatedLine)
        .getBytes(StandardCharsets.UTF_8))
    System.err.println(s"[bench] wrote $outPath")
    // The driver captures only the LAST ~2000 chars of merged output (then
    // sbt appends its "[success] Total time ..." trailer), so a full
    // 128-query line gets head-truncated and fails to parse — it did in
    // rounds 1-3. Print a line GUARANTEED to fit: 3-decimal seconds,
    // slowest queries first, greedily truncated to a 1500-char budget with
    // an explicit omission count; the complete medians + per-run samples
    // are always in bench_results.json.
    // 2000-char driver window minus sbt's "[success] Total time ..."
    // trailer (~75 chars) and margin
    val budget = 1850
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val bySlowest = results.sortBy { case (k, v) => (-v, k) }
    val isoField =
      if (isolated.isEmpty) ""
      else isolated.toSeq.sorted
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString(""""isolated":{""", ",", s"""},"aging_ratio":$agingJson,""")
    val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$runs,"sf":"$sfDir","n_queries":${results.size},$isoField"full":"$outPath","queries":{"""
    val entries = bySlowest.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
    val keptBuf = scala.collection.mutable.ListBuffer.empty[String]
    // reserve room for the closing brace + worst-case omission suffix
    var len = head.length + "},\"queries_omitted\":000}".length
    entries.foreach { e =>
      if (len + e.length + 1 <= budget) { keptBuf += e; len += e.length + 1 }
    }
    val omitted = entries.size - keptBuf.size
    val compact = head + keptBuf.mkString(",") + "}" +
      (if (omitted > 0) s""","queries_omitted":$omitted}""" else "}")
    println(compact)
    spark.stop()
  }
}
