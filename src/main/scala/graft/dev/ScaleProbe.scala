package graft.dev

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** sf0.1 → sf1.0 cost-curve probe of the heaviest queries (round-10
  * verdict #1): measures each query in its OWN fresh child JVM (the
  * Bench singleton protocol — cold = run 1, warm = min of the rest) at
  * each scale of a disjoint-replication ladder built by
  * [[graft.dev.ScaleUp]], then fits the log-log slope of warm seconds
  * vs scale multiple k.
  *
  * Ground truth by construction: disjoint key-offset copies make every
  * probed family's true work ~k^1 (see ScaleUp's scaladoc), so the
  * fitted exponent reads directly as an ENGINE verdict — ≈1.0 confirms
  * SCALE.md's linear cost claim for that operator at 10× data on the
  * same 32-core/32-partition box; meaningfully >1 means the
  * implementation degrades superlinearly (spill, hash-agg pressure,
  * driver state) and gets a PLANS.md postmortem.
  *
  * Box-speed epochs are the known confound on this shared VM, so each
  * child's xorshift calibration is published per sample and the
  * exponent is ALSO fitted over calibration-normalized warms.
  *
  * Env:
  *   SPARK_GRAFT_PROBE_SCALES  comma list of k:dir
  *     (default "1:/root/testdata/sf0.1,2:scale_fixtures/sf0.2,
  *               5:scale_fixtures/sf0.5,10:scale_fixtures/sf1.0")
  *   SPARK_GRAFT_PROBE_QUERIES comma list
  *     (default the round-10 top-5 heaviest)
  *   SPARK_GRAFT_PROBE_RUNS    runs per (query, scale), default 3
  *   SPARK_GRAFT_PROBE_OUT     output path, default SCALE_PROBE_r11.json
  */
object ScaleProbe {

  private def fmt(v: Double): String =
    if (v.isNaN) "null"
    else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** Least-squares slope of ln(y) on ln(k) — the fitted cost exponent. */
  private def slope(pts: Seq[(Double, Double)]): Double = {
    val n = pts.size
    if (n < 2) Double.NaN
    else {
      val xs = pts.map(p => math.log(p._1)); val ys = pts.map(p => math.log(p._2))
      val mx = xs.sum / n; val my = ys.sum / n
      val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val den = xs.map(x => (x - mx) * (x - mx)).sum
      if (den == 0) Double.NaN else num / den
    }
  }

  def main(args: Array[String]): Unit = {
    val scales = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALES",
      "1:/root/testdata/sf0.1,2:scale_fixtures/sf0.2," +
        "5:scale_fixtures/sf0.5,10:scale_fixtures/sf1.0")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { s =>
        val Array(k, dir) = s.split(":", 2); (k.toInt, dir)
      }
    val queries = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES",
      "q_link_pred,q_ktruss_converged,q_ktruss,embed_dbscan,q_betweenness")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt.max(2)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "SCALE_PROBE_r11.json")

    // rows: (query, k, dir, cold, warm, warmNorm, gcS@warmRun, spillMB, calib)
    val rows = for ((k, dir) <- scales; q <- queries) yield {
      // timeout ∝ scale: a k=10 child runs `runs` passes of a query whose
      // sf0.1 cost is up to ~20 s, so ~k*20*runs sec of measurement + JVM
      // + cold overheads; 10 + 6k minutes is generous without letting a
      // wedged child eat the whole probe
      System.err.println(s"[probe] $q @ k=$k ($dir)")
      val m = graft.Bench.spawnChild(Seq(q), dir, runs, timeoutMinutes = 10 + 6L * k)
      val calib = m.get(graft.Bench.CalibName)
        .flatMap(_.headOption).map(_.sec).getOrElse(Double.NaN)
      val xs = m.getOrElse(q, Vector.empty)
      val ok = xs.filter(_.sec >= 0)
      if (ok.isEmpty) (q, k, dir, -1.0, -1.0, Double.NaN, Double.NaN, -1L, calib)
      else {
        val cold = xs.head.sec
        val warmRuns = xs.drop(1).filter(_.sec >= 0)
        val warmS = if (warmRuns.isEmpty) xs.head else warmRuns.minBy(_.sec)
        val warmNorm = if (calib.isNaN || calib <= 0) warmS.sec else warmS.sec / calib
        (q, k, dir, cold, warmS.sec, warmNorm, warmS.gcS, warmS.spillB >> 20, calib)
      }
    }

    val perQuery = queries.map { q =>
      val mine = rows.filter(r => r._1 == q && r._5 > 0).sortBy(_._2)
      val expRaw = slope(mine.map(r => (r._2.toDouble, r._5)))
      val expNorm = slope(mine.map(r => (r._2.toDouble, r._6)))
      val base = mine.find(_._2 == 1).map(_._5).getOrElse(Double.NaN)
      val top = mine.lastOption
      val ratioTop = top.map(t => if (base > 0) t._5 / base else Double.NaN)
        .getOrElse(Double.NaN)
      val scalesJson = rows.filter(_._1 == q).sortBy(_._2).map { r =>
        s""""${r._2}":{"dir":"${r._3}","cold":${fmt(r._4)},"warm":${fmt(r._5)},"warm_norm":${fmt(r._6)},"gc_s":${fmt(r._7)},"spill_mb":${r._8},"calib":${fmt(r._9)}}"""
      }.mkString("{", ",", "}")
      s""""$q":{"scales":$scalesJson,"exponent":${fmt(expRaw)},"exponent_norm":${fmt(expNorm)},"ratio_max_vs_1":${fmt(ratioTop)}}"""
    }.mkString("{", ",", "}")

    val json =
      s"""{"metric":"scale_probe","runs_per_point":$runs,""" +
        s""""protocol":"one fresh child JVM per (query, scale); cold=run 1, warm=min of later runs; warm_norm=warm/child xorshift calib; exponent=least-squares slope of ln(warm) vs ln(k)",""" +
        s""""generator":"graft.dev.ScaleUp disjoint key-offset replication of sf0.1 (ground-truth work ~ k^1; exponent >> 1 = engine bottleneck)",""" +
        s""""queries":$perQuery}"""
    Files.write(Paths.get(outPath), (json + "\n").getBytes(StandardCharsets.UTF_8))
    System.err.println(s"[probe] wrote $outPath")
    println(json)
  }
}
