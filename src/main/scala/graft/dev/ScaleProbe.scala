package graft.dev

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

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
  * CRASH-RESILIENT / CUMULATIVE: every (query, k) measurement is
  * appended to SPARK_GRAFT_PROBE_ROWS (TSV) the moment its child
  * returns, and the final JSON is recomputed from ALL rows in that file
  * — including rows written by PREVIOUS invocations. So the ladder can
  * be run one rung at a time (k=1 first to secure the baseline, k=10
  * next for the headline ratio, middles after), a kill loses at most
  * the in-flight child, and a rung that landed in a shared-VM
  * preemption storm can simply be re-run: aggregation takes the MIN
  * warm per (query, k) across invocations, which is the right robust
  * statistic on a box whose epochs inflate 32-thread stages 2-4×.
  *
  * Box-speed epochs are the known confound, so each child's xorshift
  * calibration (scalar CPU speed) AND its mt_ratio (32-thread parallel
  * efficiency — the preemption-storm detector, see
  * Bench.calibrateMtRatio) are recorded per row and published per
  * point; the exponent is ALSO fitted over calibration-normalized
  * warms.
  *
  * Env:
  *   SPARK_GRAFT_PROBE_SCALES  comma list of k:dir for THIS invocation
  *     (default "1:/root/testdata/sf0.1"); pass "" to skip measuring
  *     and just re-emit the JSON from accumulated rows
  *   SPARK_GRAFT_PROBE_QUERIES comma list
  *     (default the round-10 top-5 heaviest)
  *   SPARK_GRAFT_PROBE_RUNS    runs per (query, scale), default 4
  *     (storm boxes need 3-4 runs to reach the warm floor)
  *   SPARK_GRAFT_PROBE_ROWS    cumulative TSV, default scale_probe_rows.tsv
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

  /** One measured point. warm = min of runs 2+; cold = run 1 (pays
    * session-memo builds); gc/spill taken from the warm-min run.
    */
  private case class Row(q: String, k: Int, dir: String, cold: Double,
                         warm: Double, warmNorm: Double, gcS: Double,
                         spillMb: Long, calib: Double, calibMt: Double)

  private def rowLine(r: Row): String =
    Seq(r.q, r.k, r.dir, r.cold, r.warm, r.warmNorm, r.gcS, r.spillMb,
      r.calib, r.calibMt).mkString("\t")

  private def parseRow(l: String): Option[Row] = {
    val f = l.split("\t", -1)
    if (f.length < 10) None
    else scala.util.Try(Row(f(0), f(1).toInt, f(2), f(3).toDouble,
      f(4).toDouble, f(5).toDouble, f(6).toDouble, f(7).toLong,
      f(8).toDouble, f(9).toDouble)).toOption
  }

  def main(args: Array[String]): Unit = {
    val scales = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALES",
      "1:/root/testdata/sf0.1")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { s =>
        val Array(k, dir) = s.split(":", 2); (k.toInt, dir)
      }
    val queries = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES",
      "q_link_pred,q_ktruss_converged,q_ktruss,embed_dbscan,q_betweenness")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "4").toInt.max(2)
    val rowsPath = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "scale_probe_rows.tsv"))
    val outPath = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "SCALE_PROBE_r11.json")

    for ((k, dir) <- scales; q <- queries) {
      // timeout ∝ scale: a k=10 child runs `runs` passes of a query whose
      // sf0.1 cost is up to ~20 s, so ~k*20*runs sec of measurement + JVM
      // + cold overheads; 15 + 10k minutes keeps headroom for the
      // shared-VM preemption epochs (sy-storm slowdowns measured 2-4×
      // mid-child on the round-11 box) without letting a wedged child
      // eat the whole probe
      System.err.println(s"[probe] $q @ k=$k ($dir)")
      val m = graft.Bench.spawnChild(Seq(q), dir, runs, timeoutMinutes = 15 + 10L * k)
      val calib = m.get(graft.Bench.CalibName)
        .flatMap(_.headOption).map(_.sec).getOrElse(Double.NaN)
      val calibMt = m.get(graft.Bench.CalibMtName)
        .flatMap(_.headOption).map(_.sec).getOrElse(Double.NaN)
      val xs = m.getOrElse(q, Vector.empty)
      val ok = xs.filter(_.sec >= 0)
      val row =
        if (ok.isEmpty) Row(q, k, dir, -1.0, -1.0, Double.NaN, Double.NaN,
          -1L, calib, calibMt)
        else {
          val cold = xs.head.sec
          val warmRuns = xs.drop(1).filter(_.sec >= 0)
          val warmS = if (warmRuns.isEmpty) xs.head else warmRuns.minBy(_.sec)
          val warmNorm = if (calib.isNaN || calib <= 0) warmS.sec else warmS.sec / calib
          Row(q, k, dir, cold, warmS.sec, warmNorm, warmS.gcS,
            warmS.spillB >> 20, calib, calibMt)
        }
      Files.write(rowsPath, (rowLine(row) + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      System.err.println(s"[probe] row: ${rowLine(row)}")
    }

    // ---- merge: ALL accumulated rows (this + previous invocations) ----
    val all: Seq[Row] =
      if (Files.exists(rowsPath))
        Files.readAllLines(rowsPath, StandardCharsets.UTF_8)
          .asScala.toSeq.flatMap(parseRow)
      else Seq.empty
    val allQueries = (queries ++ all.map(_.q)).distinct

    val perQuery = allQueries.map { q =>
      // best (min-warm) row per k across every invocation — robust to
      // rungs re-run after landing in a preemption epoch
      val best = all.filter(r => r.q == q && r.warm > 0)
        .groupBy(_.k).map { case (_, rs) => rs.minBy(_.warm) }
        .toSeq.sortBy(_.k)
      val expRaw = slope(best.map(r => (r.k.toDouble, r.warm)))
      val expNorm = slope(best.map(r => (r.k.toDouble, r.warmNorm)))
      val base = best.find(_.k == 1).map(_.warm).getOrElse(Double.NaN)
      val ratioTop = best.lastOption
        .map(t => if (base > 0) t.warm / base else Double.NaN)
        .getOrElse(Double.NaN)
      val scalesJson = best.map { r =>
        s""""${r.k}":{"dir":"${r.dir}","cold":${fmt(r.cold)},"warm":${fmt(r.warm)},"warm_norm":${fmt(r.warmNorm)},"gc_s":${fmt(r.gcS)},"spill_mb":${r.spillMb},"calib":${fmt(r.calib)},"calib_mt_ratio":${fmt(r.calibMt)}}"""
      }.mkString("{", ",", "}")
      s""""$q":{"scales":$scalesJson,"exponent":${fmt(expRaw)},"exponent_norm":${fmt(expNorm)},"ratio_max_vs_1":${fmt(ratioTop)}}"""
    }.mkString("{", ",", "}")

    val json =
      s"""{"metric":"scale_probe","runs_per_point":$runs,""" +
        s""""protocol":"one fresh child JVM per (query, scale); cold=run 1, warm=min of later runs across ALL invocations of a rung; warm_norm=warm/child xorshift calib; calib_mt_ratio=32-thread/1-thread parallel-efficiency probe (DRAM-bandwidth-bound: healthy floor ~2.1 on this box class, preemption epoch 2-3x the floor); exponent=least-squares slope of ln(warm) vs ln(k)",""" +
        s""""generator":"graft.dev.ScaleUp disjoint key-offset replication of sf0.1 (ground-truth work ~ k^1; exponent >> 1 = engine bottleneck)",""" +
        s""""queries":$perQuery}"""
    Files.write(Paths.get(outPath), (json + "\n").getBytes(StandardCharsets.UTF_8))
    System.err.println(s"[probe] wrote $outPath")
    println(json)
  }
}
