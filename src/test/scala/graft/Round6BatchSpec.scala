package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.{Drift, GraphSample}
import graft.text.TextOps

/** Round-6 batch 3: deterministic graph training-data sampling
  * (DeepWalk walks, GraphSAGE fanouts), skip-gram pair extraction, and
  * exact Wasserstein-1 drift — each checked against an independent
  * driver-side replication on a hand-sized fixture.
  */
class Round6BatchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** JVM twin of the cross-engine md5-derived 60-bit digest. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  // path graph 1-2-3 plus a spur 2-4: degrees 1:1, 2:3, 3:1, 4:1
  private def pathEdges =
    Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("item_a", "item_b")

  test("randomWalks replays a driver-side walk simulation exactly") {
    val walkLen = 3
    val got = GraphSample
      .randomWalks(pathEdges, "item_a", "item_b", walkLen = walkLen, startMod = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val adj = Map( // neighbors ordered by id — the engine's index order
      1L -> Vector(2L), 2L -> Vector(1L, 3L, 4L),
      3L -> Vector(2L), 4L -> Vector(2L))
    val expected = adj.keys.flatMap { start =>
      var cur = start
      (start, 0, start) +: (1 to walkLen).map { t =>
        val ns = adj(cur)
        cur = ns((h60(s"walk:$start:$t") % ns.size).toInt)
        (start, t, cur)
      }
    }.toSet
    assert(got == expected)
  }

  test("randomWalks: every transition is an edge; one row per walk-step") {
    val walkLen = 4
    val rows = GraphSample
      .randomWalks(pathEdges, "item_a", "item_b", walkLen = walkLen, startMod = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val sym = Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (2L, 4L), (4L, 2L))
    val byWalk = rows.groupBy(_._1)
    assert(byWalk.keySet == Set(1L, 2L, 3L, 4L))
    byWalk.foreach { case (_, steps) =>
      assert(steps.length == walkLen + 1)
      val ordered = steps.sortBy(_._2).map(_._3)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(sym.contains((a, b)))
        case _           => ()
      }
    }
  }

  test("neighborSample replays a driver-side fanout simulation exactly") {
    val (k1, k2) = (2, 1)
    val got = GraphSample
      .neighborSample(pathEdges, "item_a", "item_b", k1 = k1, k2 = k2, startMod = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .toSet

    val adj = Map(
      1L -> Vector(2L), 2L -> Vector(1L, 3L, 4L),
      3L -> Vector(2L), 4L -> Vector(2L))
    def tape(src: Long): Vector[(Long, Int)] = adj(src)
      .sortBy(dst => (md5Hex(s"sage:$src:$dst"), dst)).zipWithIndex
      .map { case (d, i) => (d, i + 1) }
    val expected = (for {
      root <- adj.keys
      (n1, r1) <- tape(root).take(k1)
      (n2, r2) <- tape(n1).take(k2)
    } yield (root, n1, n2, r1, r2)).toSet
    assert(got == expected)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("skipgramPairs counts symmetric window pairs") {
    val docs = Seq("a b c", "b a").toDF("text")
    val got = TextOps.skipgramPairs(docs, window = 2, k = 100)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // forward pairs: (a,b),(a,c),(b,c) from doc1; (b,a) from doc2;
    // symmetric union doubles each direction
    assert(got == Map(
      ("a", "b") -> 2L, ("b", "a") -> 2L,
      ("a", "c") -> 1L, ("c", "a") -> 1L,
      ("b", "c") -> 1L, ("c", "b") -> 1L))
  }

  test("wassersteinDrift matches the hand-computed CDF integral") {
    // A = {1,1,3} (web0), B = {2,3} (web1): W1 = (|2·2−0·3| + |2·2−1·3|)/6
    val docs = Seq(
      ("web0", 1), ("web0", 1), ("web0", 3),
      ("web1", 2), ("web1", 3)).toDF("source", "n_chars")
    val r = Drift.wassersteinDrift(docs).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 3L) // n_a
    assert(r(0).getLong(1) == 2L) // n_b
    assert(r(0).getLong(2) == 833333L) // (5 * 1e6) div 6
    assert(math.abs(r(0).getDouble(3) - 0.833333) < 1e-9)
  }

  test("textrank replays a driver-side integer PageRank on a word path") {
    // corpus word graph: a-b, b-c (path) — b must rank first
    val docs = Seq("a b", "b c").toDF("text")
    val got = graft.text.TextRank.keywords(docs, k = 10, iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // independent replication of the exact integer recurrence
    val adj = Map("a" -> Seq("b"), "b" -> Seq("a", "c"), "c" -> Seq("b"))
    val od = adj.map { case (w, ns) => w -> ns.size.toLong }
    val mass = 1000000000000L
    val n = 3L
    val tp = (15L * mass) / (100L * n)
    var r: Map[String, Long] = adj.keys.map(w => (w, mass / n)).toMap
    for (_ <- 1 to 5) {
      val prev = r // explicit snapshot: the closure must not see updates
      r = adj.keySet.toList.map { v =>
        val contribs = adj.toList
          .collect { case (u, ns) if ns.contains(v) => prev(u) / od(u) }
          .sum
        (v, tp + (85L * contribs) / 100L)
      }.toMap
    }
    val expected = r.toSeq.sortBy { case (w, u) => (-u, w) }
    assert(got.toSeq == expected)
    assert(got.head._1 == "b") // the hub word ranks first
  }

  test("lshEval is consistent with its two component pipelines") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different text about spark physical plans here"),
      (4L, "unrelated third subject entirely with its own words")
    ).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.lshEval(docs).collect()(0)
    val nPred = graft.dedup.Dedup.minhashDedup(docs, threshold = 0.5).count()
    val nTruth = graft.dedup.Dedup.ngramJaccard(docs, threshold = 0.5).count()
    assert(r.getLong(0) == nPred)
    assert(r.getLong(1) == nTruth)
    assert(nTruth >= 1L) // the exact duplicate pair is ground truth
    assert(r.getLong(2) <= math.min(r.getLong(0), r.getLong(1))) // hits bounded
    assert(r.getLong(3) == (if (nPred == 0) 0L else 1000000L * r.getLong(2) / nPred))
    assert(r.getLong(4) == (if (nTruth == 0) 0L else 1000000L * r.getLong(2) / nTruth))
  }

  test("wassersteinDrift is zero iff the halves share a distribution") {
    val same = Seq(
      ("web0", 5), ("web0", 9), ("web1", 5), ("web1", 9)).toDF("source", "n_chars")
    val r = Drift.wassersteinDrift(same).collect()(0)
    assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0)
  }

  test("cuped recovers a planted linear pre/post relation exactly") {
    // post = 2·pre, no noise: theta = 2, adjusted variance = 0,
    // reduction = 1. Days 1-10 are pre (mid = Jan 6), 11-20 post.
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val rows = (1L to 4L).flatMap { u =>
      // pre-value u dollars on a pre day; post-value 2u on a post day
      Seq((1L, ts(2), u, "view", u.toDouble, ""),
        (2L, ts(15), u, "view", 2.0 * u, ""))
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.analytics.Experiments.cuped(df).collect()(0)
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 1000L) // (1+2+3+4)·100 cents
    assert(r.getLong(2) == 2000L)
    assert(r.getDouble(3) == 2.0) // theta
    assert(r.getDouble(5) == 0.0) // var_adj
    assert(r.getDouble(6) == 1.0) // var_reduction
  }

  test("sprt replays the Wald recurrence with the shared nano literals") {
    def nano(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    val lS = nano(math.log(0.12 / 0.10))
    val lF = nano(math.log(0.88 / 0.90))
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    // treatment arm = even event_id; day 1: 2 trials 1 success;
    // day 2: +2 trials +2 successes
    val rows = Seq(
      (2L, ts(1), 1L, "purchase", 1.0, ""), (4L, ts(1), 2L, "view", 1.0, ""),
      (3L, ts(1), 3L, "purchase", 1.0, ""), // odd: control, excluded
      (6L, ts(2), 4L, "purchase", 1.0, ""), (8L, ts(2), 5L, "purchase", 1.0, ""))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.analytics.Experiments.sprtDaily(df)
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got(0) == ((2L, 1L, lS + lF, "continue")))
    assert(got(1) == ((4L, 3L, 3 * lS + lF, "continue")))
  }

  test("poissonBootstrap: constant data has exactly zero SE; weights ~ n") {
    val const = (1L to 200L).map(k => (k, 250.00)).toDF("o_orderkey", "o_totalprice")
    val r = graft.analytics.Experiments.poissonBootstrap(const, reps = 8).collect()(0)
    assert(r.getInt(0) == 8)
    // every replicate mean is exactly 250.00 regardless of its weights
    assert(r.getLong(1) == 8L * 25000L * 1000000L)
    assert(r.getDouble(2) == 0.0)

    // Poisson(1) weights: each replicate's effective n stays near n
    val varied = (1L to 500L).map(k => (k, k.toDouble)).toDF("o_orderkey", "o_totalprice")
    val r2 = graft.analytics.Experiments.poissonBootstrap(varied, reps = 4).collect()(0)
    assert(r2.getDouble(2) > 0.0) // varied data: positive uncertainty
    // determinism: byte-identical on re-run
    val r3 = graft.analytics.Experiments.poissonBootstrap(varied, reps = 4).collect()(0)
    assert(r2 == r3)
  }

  test("mannWhitney matches hand-computed U/CLES including ties") {
    // arm A (even keys) = {1.00, 2.00}, arm B = {2.00, 3.00}:
    // ranks 1, 2.5, 2.5, 4 -> R_a = 3.5, U_a = 0.5, CLES = 0.125
    val df = Seq((2L, 1.00), (4L, 2.00), (1L, 2.00), (3L, 3.00))
      .toDF("o_orderkey", "o_totalprice")
    val r = graft.analytics.Experiments.mannWhitney(df).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.125) // CLES
    assert(r.getDouble(3) < 0.0)    // A stochastically below B
    // symmetric arms: CLES = 0.5, z = 0 exactly
    val sym = Seq((2L, 1.00), (4L, 3.00), (1L, 1.00), (3L, 3.00))
      .toDF("o_orderkey", "o_totalprice")
    val r2 = graft.analytics.Experiments.mannWhitney(sym).collect()(0)
    assert(r2.getDouble(2) == 0.5 && r2.getDouble(3) == 0.0)
  }

  test("featureHash conserves tokens and bounds the signed mass") {
    val docs = Seq("alpha beta gamma alpha", "beta delta").toDF("text")
    val full = TextOps.featureHash(docs, dim = 16, k = 1000).collect()
    assert(full.map(_.getLong(1)).sum == 6L)       // every token lands once
    full.foreach { r =>
      assert(math.abs(r.getLong(3)) <= r.getLong(1)) // |net| <= occupancy
      assert(r.getLong(2) <= r.getLong(1))           // distinct <= tokens
      assert(r.getLong(0) >= 0 && r.getLong(0) < 16)
    }
    // deterministic across runs
    val again = TextOps.featureHash(docs, dim = 16, k = 1000).collect()
    assert(full.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("isotonic fit is monotone and replays the driver-side minimax") {
    val iso = graft.analytics.Experiments.isotonicCalibration(
      graft.io.Tables.customer(spark, TestSpark.sfDir),
      graft.io.Tables.orders(spark, TestSpark.sfDir))
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // monotone non-decreasing by construction of the minimax identity
    iso.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(a <= b); case _ => ()
    }
    // exact replication: iso_i = max_{j<=i} min_{k>=i} (1e6*pos)/(n) over j..k
    val n = iso.map(_._2); val p = iso.map(_._3)
    val b = iso.length
    val expected = (0 until b).map { i =>
      (0 to i).map { j =>
        (i until b).map { k =>
          val sn = (j to k).map(n).sum; val sp = (j to k).map(p).sum
          1000000L * sp / sn
        }.min
      }.max
    }
    assert(iso.map(_._4).toSeq == expected)
  }

  test("conformal qhat is the k-th smallest residual with valid coverage") {
    val orders = graft.io.Tables.orders(spark, TestSpark.sfDir)
    val r = graft.analytics.Experiments.conformalInterval(orders).collect()(0)
    val (nCal, k, qhat, cov) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))
    val resid = graft.analytics.Drift.seasonalNaiveBacktest(orders)
      .select(abs(col("actual_cents") - col("forecast_cents")).as("r"))
      .as[Long].collect().sorted
    assert(nCal == resid.length.toLong)
    assert(k == math.min((nCal + 1) * 9 / 10 + (if ((nCal + 1) * 9 % 10 == 0) 0 else 1), nCal).toInt)
    assert(qhat == resid(k - 1))
    assert(cov >= 1000000L * k / nCal) // at least k/n of residuals within
  }

  test("paretoAbc splits a hand-built revenue tail at 80/95 exactly") {
    // parts with revenue 0.50, 0.30, 0.15, 0.05 (cents 50/30/15/5):
    // cumulative 50, 80 (A, <=80%), 95 (B, <=95%), 100 (C)
    val li = Seq((1L, 0.50), (2L, 0.30), (3L, 0.15), (4L, 0.05))
      .toDF("l_partkey", "l_extendedprice")
    val got = graft.analytics.Metrics.paretoAbc(li).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      "A" -> ((2L, 80L, 800000L)),
      "B" -> ((1L, 15L, 150000L)),
      "C" -> ((1L, 5L, 50000L))))
  }

  test("sampleRatioMismatch fires on a skewed split, not a balanced one") {
    def ev(ids: Seq[Long]) = ids.map(i => (i, "view")).toDF("event_id", "event_type")
    val balanced = graft.analytics.Experiments
      .sampleRatioMismatch(ev(1L to 1000L)).collect()(0)
    assert(balanced.getLong(2) == 0L && !balanced.getBoolean(3))
    // 900 even vs 100 odd: chi2 = 800^2/1000 = 640 >> 3.84
    val skewIds = (1L to 1800L by 2).map(_ + 1) ++ (1L to 199L by 2)
    val skewed = graft.analytics.Experiments
      .sampleRatioMismatch(ev(skewIds)).collect()(0)
    assert(skewed.getLong(2) == 640000000L && skewed.getBoolean(3))
  }

  test("topSessionPaths orders by (ts, event_id) and caps the prefix") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L, "view"),
      (3L, ts("2024-01-01 09:05:00"), 7L, "click"),
      (2L, ts("2024-01-01 09:05:00"), 7L, "cart"), // ts tie -> event_id order
      (9L, ts("2024-01-02 10:00:00"), 7L, "view"), // next day: new session
      (8L, ts("2024-01-01 11:00:00"), 8L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.analytics.Breadth3.topSessionPaths(ev)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("view>cart>click" -> 1L, "view" -> 2L))
    val capped = graft.analytics.Breadth3.topSessionPaths(ev, maxEvents = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(capped == Map("view>cart" -> 1L, "view" -> 2L))
  }

  test("fertilityBySource: no merges = 1 char/token; a merge raises it") {
    val docs = Seq(("web", "ab cd")).toDF("source", "text")
    val none = graft.text.Bpe.fertilityBySource(docs, Nil).collect()(0)
    // every char its own symbol: 4 chars, 4 tokens, fertility exactly 1
    assert(none.getLong(1) == 2L && none.getLong(2) == 4L && none.getLong(3) == 4L)
    assert(none.getLong(4) == 1000000L && none.getDouble(5) == 1.0)
    val merged = graft.text.Bpe.fertilityBySource(docs,
      Seq((1, "a", "b</w>", "ab</w>", 1L))).collect()(0)
    // "ab" fuses to one token: 4 chars / 3 tokens
    assert(merged.getLong(3) == 3L && merged.getLong(4) == 1333333L)
  }

  // ---------------- seeded-random differential properties ----------------

  private val rnd = new scala.util.Random(6026)

  test("randomWalks replays the driver simulation on random graphs") {
    for (_ <- 1 to 3) {
      val n = 8 + rnd.nextInt(8)
      val edges = (1 to 40).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val df = edges.toDF("item_a", "item_b")
      val walkLen = 3
      val got = GraphSample.randomWalks(df, "item_a", "item_b",
        walkLen = walkLen, startMod = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.toVector }
      val starts = adj.keys.filter(v => h60(s"walk:start:$v") % 2 == 0)
      val expected = starts.flatMap { start =>
        var cur = start
        (start, 0, start) +: (1 to walkLen).map { t =>
          val ns = adj(cur)
          cur = ns((h60(s"walk:$start:$t") % ns.size).toInt)
          (start, t, cur)
        }
      }.toSet
      assert(got == expected)
    }
  }

  test("skipgramPairs matches a brute-force reference on random docs") {
    val docs = (1 to 50).map { _ =>
      Seq.fill(rnd.nextInt(12))("w" + rnd.nextInt(6)).mkString(" ")
    }
    val win = 3
    val got = TextOps.skipgramPairs(docs.toDF("text"), window = win, k = 100000)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val expected = docs.flatMap { text =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)
      for {
        i <- t.indices; j <- (i + 1) until math.min(i + win + 1, t.length)
        p <- Seq((t(i), t(j)), (t(j), t(i)))
      } yield p
    }.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    assert(got == expected)
  }

  test("wassersteinDrift matches a brute integer integral on random data") {
    for (_ <- 1 to 3) {
      val rows = (1 to 60).map { _ =>
        (if (rnd.nextBoolean()) "web0" else "web1", 1 + rnd.nextInt(20))
      }
      val r = Drift.wassersteinDrift(rows.toDF("source", "n_chars")).collect()(0)
      val a = rows.filter(_._1 == "web0").map(_._2.toLong).sorted
      val b = rows.filter(_._1 == "web1").map(_._2.toLong).sorted
      val vals = (a ++ b).distinct.sorted
      var num = BigInt(0)
      for (Seq(x, nx) <- vals.sliding(2) if vals.size >= 2) {
        val ca = a.count(_ <= x); val cb = b.count(_ <= x)
        num += BigInt((ca.toLong * b.size - cb.toLong * a.size).abs) * (nx - x)
      }
      assert(r.getLong(0) == a.size.toLong && r.getLong(1) == b.size.toLong)
      assert(BigInt(r.getLong(2)) == num * 1000000 / (BigInt(a.size) * b.size))
    }
  }
}
