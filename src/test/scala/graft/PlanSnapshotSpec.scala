package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanFingerprint

/** Plan-regression gate (round-10 verdict item #2): the canonicalized
  * physical-plan fingerprints of the ~20 heaviest bench queries are
  * PINNED in `src/test/resources/plan_snapshots.txt`; any change to a
  * join strategy, exchange count/kind, window partitioning, aggregate
  * keying, scan width, or pushed filters fails this spec with a line
  * diff — the systematic version of the ad-hoc plan pins in
  * ScaleTechniquesSpec and AnnSpec's q_ivm_ann no-SMJ test, catching
  * the next broadcast→SortMergeJoin flip at review time instead of in
  * a bench postmortem.
  *
  * After an INTENDED plan change, regenerate and commit the snapshot:
  *
  *   GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanSnapshotSpec"
  *
  * Fingerprints are taken on a dedicated child session with AQE OFF
  * (the static plan is the deterministic artifact; AQE runtime
  * re-plans are bench territory) at the fixture SF every suite uses
  * (sf0.001), so they are stable across JVMs. Queries whose builders
  * make runtime dispatch decisions (frontier fraction, id packing,
  * skew advice) stay deterministic at a fixed dataset, which is
  * exactly what makes the pin meaningful: the snapshot records the
  * dispatch the fixture SELECTS, and an unintended dispatch change is
  * a diff too.
  */
class PlanSnapshotSpec extends AnyFunSuite {

  private val sfDir = TestSpark.sfDir
  private val snapPath = "src/test/resources/plan_snapshots.txt"

  /** The heaviest queries by BENCH_r09 suite seconds — the set whose
    * plans are worth pinning (together ~40% of total bench time).
    */
  private val pinned = Seq(
    "q_link_pred", "q_ktruss_converged", "q_ktruss", "embed_dbscan",
    "q_betweenness", "pipeline_mm_curate", "text_textrank",
    "q_hyperball_closeness", "q_modularity", "q_cf_eval", "q_salted_join",
    "q_random_walks", "dedup_cosine_pairs", "q_clustering_coef",
    "pipeline_corpus_prep", "q_label_prop", "q_poisson_bootstrap",
    "ann_topk_ivfpq", "text_nb_eval", "text_unigram_train")

  // dedicated child session: AQE off for static-plan determinism,
  // without flipping the shared TestSpark session's conf under
  // concurrently-running suites (same SparkContext, own SQLConf)
  private lazy val planSession = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private def currentFingerprints(): Seq[(String, String)] =
    pinned.map { n =>
      n -> PlanFingerprint.fingerprint(SparkEntry.queries(n)(planSession, sfDir))
    }

  private def renderSnapshot(fps: Seq[(String, String)]): String =
    fps.map { case (n, fp) => s"== $n ==\n$fp\n" }.mkString("\n")

  private def parseSnapshot(text: String): Map[String, String] =
    text.split("(?m)^== ").filter(_.nonEmpty).map { block =>
      val nl = block.indexOf('\n')
      val name = block.substring(0, nl).stripSuffix(" ==").trim
      name -> block.substring(nl + 1).trim
    }.toMap

  test("physical-plan fingerprints of the heaviest queries match the pinned snapshot") {
    val got = currentFingerprints()
    if (sys.env.get("GRAFT_REGEN_PLANS").contains("1")) {
      java.nio.file.Files.write(java.nio.file.Paths.get(snapPath),
        renderSnapshot(got).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      info(s"regenerated $snapPath (${got.size} queries)")
    } else {
      val f = new java.io.File(snapPath)
      assert(f.exists(), s"missing $snapPath — run GRAFT_REGEN_PLANS=1 " +
        "sbt 'testOnly graft.PlanSnapshotSpec' and commit it")
      val want = parseSnapshot(
        new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8))
      val diffs = got.flatMap { case (n, fp) =>
        want.get(n) match {
          case None => Some(s"$n: not in snapshot (new pin? regenerate)")
          case Some(w) if w != fp.trim =>
            val wl = w.linesIterator.toVector
            val gl = fp.trim.linesIterator.toVector
            val firstDiff = wl.zipAll(gl, "<absent>", "<absent>")
              .zipWithIndex.collectFirst { case ((a, b), i) if a != b =>
                s"  line ${i + 1}: pinned '${a.trim}' vs now '${b.trim}'" }
            Some(s"$n: plan changed (${wl.size} -> ${gl.size} nodes)\n" +
              firstDiff.getOrElse("  (length-only diff)"))
          case _ => None
        }
      }
      assert(diffs.isEmpty,
        "physical plans drifted from the pinned snapshot — if INTENDED, " +
          "regenerate with GRAFT_REGEN_PLANS=1 sbt 'testOnly " +
          "graft.PlanSnapshotSpec' and commit; diffs:\n" +
          diffs.mkString("\n"))
      val stale = want.keySet -- pinned.toSet
      assert(stale.isEmpty, s"snapshot pins queries no longer listed: $stale")
    }
  }

  test("the fingerprint detects a broadcast -> shuffle join flip (gate demo)") {
    import planSession.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "va")
    val b = Seq((1L, "p"), (2L, "q")).toDF("k", "vb")
    val broadcasted = PlanFingerprint.fingerprint(a.join(broadcast(b), "k"))
    val shuffled = PlanFingerprint.fingerprint(
      a.hint("merge").join(b.hint("merge"), "k"))
    assert(broadcasted.contains("BroadcastHashJoin"))
    assert(shuffled.contains("SortMergeJoin"))
    assert(broadcasted !== shuffled)
  }

  test("the fingerprint detects a single-partition window sneaking in (gate demo)") {
    import org.apache.spark.sql.expressions.Window
    import planSession.implicits._
    val df = Seq((1L, 2L), (3L, 4L)).toDF("k", "v")
    val keyed = PlanFingerprint.fingerprint(
      df.withColumn("r", row_number().over(Window.partitionBy("k").orderBy("v"))))
    val global = PlanFingerprint.fingerprint(
      df.withColumn("r", row_number().over(Window.orderBy("v"))))
    assert(keyed.contains("Window(partitionKeys=1)"))
    assert(global.contains("Window(partitionKeys=0)"),
      s"global window should pin as 0 partition keys:\n$global")
    assert(keyed !== global)
  }
}
