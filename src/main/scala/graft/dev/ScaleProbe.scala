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
    * `head` is the git commit the measuring child's classpath was built
    * from (round-11 advice: without it the cumulative min-warm merge
    * mixes pre-fix and post-fix rows into one curve, and a stale fast
    * row masks any later regression forever). Legacy 10-column rows
    * parse with head="legacy".
    */
  private case class Row(q: String, k: Int, dir: String, cold: Double,
                         warm: Double, warmNorm: Double, gcS: Double,
                         spillMb: Long, calib: Double, calibMt: Double,
                         head: String = "legacy")

  private def rowLine(r: Row): String =
    Seq(r.q, r.k, r.dir, r.cold, r.warm, r.warmNorm, r.gcS, r.spillMb,
      r.calib, r.calibMt, r.head).mkString("\t")

  private def parseRow(l: String): Option[Row] = {
    val f = l.split("\t", -1)
    if (f.length < 10) None
    else scala.util.Try(Row(f(0), f(1).toInt, f(2), f(3).toDouble,
      f(4).toDouble, f(5).toDouble, f(6).toDouble, f(7).toLong,
      f(8).toDouble, f(9).toDouble,
      if (f.length > 10 && f(10).nonEmpty) f(10) else "legacy")).toOption
  }

  /** Labels that can never satisfy the fresh-row precedence: rows
    * carrying them were written by a build the probe cannot identify, so
    * letting them match the current HEAD would silently reintroduce the
    * stale-fast-row masking the head column exists to prevent
    * (round-12 advice).
    */
  private val NeverFresh = Set("unknown", "legacy")

  /** The git HEAD this probe measures (env-overridable so a dirty tree
    * can be labeled explicitly). FAILS LOUDLY when git cannot resolve a
    * HEAD (round-12 advice: writing head="unknown" rows would make
    * different builds match each other as fresh) — set
    * SPARK_GRAFT_PROBE_HEAD to label the run explicitly instead.
    */
  private def gitHead(): String =
    sys.env.get("SPARK_GRAFT_PROBE_HEAD").getOrElse {
      val resolved =
        try {
          val p = new ProcessBuilder("git", "rev-parse", "--short=12", "HEAD")
            .redirectErrorStream(true).start()
          val out = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
          if (p.waitFor() == 0 && out.nonEmpty && !out.contains(' ')) Some(out)
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      resolved.getOrElse(sys.error(
        "[probe] cannot resolve git HEAD (probe running outside the repo?) — " +
          "refusing to write unlabeled rows; set SPARK_GRAFT_PROBE_HEAD to " +
          "label this build explicitly"))
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
    val outPath = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "SCALE_PROBE_r13.json")
    val head = gitHead()

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
          -1L, calib, calibMt, head)
        else {
          val cold = xs.head.sec
          val warmRuns = xs.drop(1).filter(_.sec >= 0)
          val warmS = if (warmRuns.isEmpty) xs.head else warmRuns.minBy(_.sec)
          val warmNorm = if (calib.isNaN || calib <= 0) warmS.sec else warmS.sec / calib
          Row(q, k, dir, cold, warmS.sec, warmNorm, warmS.gcS,
            warmS.spillB >> 20, calib, calibMt, head)
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

    // storm adjudication over the accumulated rows (round-11 advice: the
    // published q_link_pred exponent was superlinear ONLY because two
    // rungs' min-warm rows carried measured preemption storms) — the mt
    // floor is min(observed, healthy-floor for this box class), a row is
    // a storm point when its parallel-efficiency probe reads
    // > stormFactor× that floor or its scalar calibration reads > 1.3.
    // Floor and factor share Bench.scala's env knobs so the two
    // artifacts adjudicate one run identically on any box class.
    // default matches Bench.scala (1.9, the box class's measured
    // healthy floor) so the two artifacts adjudicate one run identically
    val mtFloorCfg = sys.env.getOrElse("SPARK_GRAFT_MT_FLOOR", "1.9").toDouble
    val stormFactor =
      sys.env.getOrElse("SPARK_GRAFT_MT_STORM_FACTOR", "2.0").toDouble
    val validMts = all.map(_.calibMt).filter(v => !v.isNaN && v > 0)
    val mtFloor =
      if (validMts.isEmpty) mtFloorCfg else math.min(validMts.min, mtFloorCfg)
    def isStorm(r: Row): Boolean =
      (!r.calibMt.isNaN && r.calibMt > stormFactor * mtFloor) ||
        (!r.calib.isNaN && r.calib > 1.3)

    val perQuery = allQueries.map { q =>
      // best (min-warm) row per k across every invocation — robust to
      // rungs re-run after landing in a preemption epoch. Rows from the
      // CURRENT git HEAD take absolute precedence (round-11 advice: a
      // stale fast row from a pre-regression build would otherwise win
      // the min forever and blind the probe); older-HEAD rows are used
      // only when a rung has no fresh row, and are flagged stale_head.
      val rows = all.filter(r => r.q == q && r.warm > 0)
      val best = rows.groupBy(_.k).map { case (_, rs) =>
        // unknown/legacy-labeled rows can NEVER be fresh, even if the
        // current run's head were somehow unlabeled too — they fall back
        // to min-over-all and get the stale_head flag below
        val fresh = rs.filter(r => r.head == head && !NeverFresh(r.head))
        val pool = if (fresh.nonEmpty) fresh else rs
        // prefer CALM evidence within the precedence pool (round 13):
        // exponent_calm is the artifact's own engine verdict, so a
        // rung's representative should be a calm measurement whenever
        // one was ever taken — before this, a storm row with a faster
        // min-warm displaced an accumulated calm row and erased the
        // rung from the calm fit (min-warm storm rows remain safe
        // UPPER bounds, so a calm row can only be a tighter-or-equal
        // honest reading). Fresh-first still wins overall: a stale
        // calm row never displaces fresh evidence of a regression.
        val calmPool = pool.filterNot(isStorm)
        if (calmPool.nonEmpty) calmPool.minBy(_.warm) else pool.minBy(_.warm)
      }.toSeq.sortBy(_.k)
      val expRaw = slope(best.map(r => (r.k.toDouble, r.warm)))
      val expNorm = slope(best.map(r => (r.k.toDouble, r.warmNorm)))
      // the engine verdict, fitted over calm points only — storm points
      // stay published (flagged) but don't bend the headline exponent
      val calm = best.filterNot(isStorm)
      val expCalm = slope(calm.map(r => (r.k.toDouble, r.warm)))
      val base = best.find(_.k == 1).map(_.warm).getOrElse(Double.NaN)
      val ratioTop = best.lastOption
        .map(t => if (base > 0) t.warm / base else Double.NaN)
        .getOrElse(Double.NaN)
      val scalesJson = best.map { r =>
        val flags = (if (isStorm(r)) List(""""storm":true""") else Nil) ++
          (if (r.head != head) List(s""""stale_head":"${r.head}"""") else Nil)
        val flagStr = if (flags.isEmpty) "" else flags.mkString(",", ",", "")
        s""""${r.k}":{"dir":"${r.dir}","cold":${fmt(r.cold)},"warm":${fmt(r.warm)},"warm_norm":${fmt(r.warmNorm)},"gc_s":${fmt(r.gcS)},"spill_mb":${r.spillMb},"calib":${fmt(r.calib)},"calib_mt_ratio":${fmt(r.calibMt)}$flagStr}"""
      }.mkString("{", ",", "}")
      s""""$q":{"scales":$scalesJson,"exponent":${fmt(expRaw)},"exponent_norm":${fmt(expNorm)},"exponent_calm":${fmt(expCalm)},"calm_points":${calm.size},"ratio_max_vs_1":${fmt(ratioTop)}}"""
    }.mkString("{", ",", "}")

    val json =
      s"""{"metric":"scale_probe","runs_per_point":$runs,"head":"$head","mt_floor":${fmt(mtFloor)},""" +
        s""""protocol":"one fresh child JVM per (query, scale); cold=run 1, warm=min of later runs across ALL invocations of a rung (rows from the current git HEAD take precedence; older-HEAD fallbacks are flagged stale_head); warm_norm=warm/child xorshift calib; calib_mt_ratio=32-thread/1-thread parallel-efficiency probe (DRAM-bandwidth-bound: healthy floor ~2.1 on this box class, preemption epoch 2-3x the floor); a point is storm-flagged when mt > 2x the run floor or calib > 1.3; exponent=least-squares slope of ln(warm) vs ln(k); exponent_calm=same fit over non-storm points only (the engine verdict)",""" +
        s""""generator":"graft.dev.ScaleUp disjoint key-offset replication of sf0.1 (ground-truth work ~ k^1; exponent >> 1 = engine bottleneck)",""" +
        s""""queries":$perQuery}"""
    Files.write(Paths.get(outPath), (json + "\n").getBytes(StandardCharsets.UTF_8))
    System.err.println(s"[probe] wrote $outPath")
    println(json)
  }
}
