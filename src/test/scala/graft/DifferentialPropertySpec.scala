package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.operators.AsOfJoin

/** Differential property tests: distributed operators vs brute-force
  * in-memory reference implementations on seeded random inputs.
  */
class DifferentialPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(2026)

  test("asOf matches the quadratic reference on random key/time data") {
    for (round <- 1 to 3) {
      val keys = 1 to 6
      val lefts = (1 to 80).map { i =>
        (i.toLong, keys(rnd.nextInt(keys.size)).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L))
      }
      val rights = (1 to 60).map { i =>
        (i.toLong, keys(rnd.nextInt(keys.size)).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L),
          rnd.nextDouble())
      }
      val leftDf = lefts.toDF("lid", "k", "t")
      val rightDf = AsOfJoin.latestPerKeyTs(
        rights.toDF("rid", "rk", "rt", "payload"), "rk", "rt", "rid")

      val got = AsOfJoin.asOf(leftDf, rightDf, "k", "rk", "t", "rt", Seq("rid"))
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap

      // brute force: per (key, ts) keep max rid, then per left row pick the
      // row with max rt <= t
      val dedupedRights = rights.groupBy(r => (r._2, r._3.getTime))
        .map { case (_, rs) => rs.maxBy(_._1) }.toSeq
      val expected = lefts.map { case (lid, k, t) =>
        val cands = dedupedRights.filter(r => r._2 == k && !r._3.after(t))
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(r => (r._3.getTime, r._1))._1))
      }.toMap
      assert(got === expected, s"round $round mismatch")
    }
  }

  test("eventSessions matches the sequential reference on random event streams") {
    import graft.analytics.Breadth
    for (round <- 1 to 3) {
      val events = (1 to 300).map { i =>
        (i.toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(600) * 60000L),
          (rnd.nextInt(8) + 1).toLong)
      }
      val df = events.toDF("event_id", "ts", "user_id")
      val got = Breadth.eventSessions(df, gapMinutes = 30)
        .select("user_id", "n_sessions", "n_events")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

      val expected = events.groupBy(_._3).map { case (uid, es) =>
        val sorted = es.sortBy(e => (e._2.getTime, e._1))
        val sessions = 1 + sorted.sliding(2).count {
          case Seq(a, b) => b._2.getTime - a._2.getTime > 30 * 60000L
          case _ => false
        }
        uid -> (sessions.toLong, es.size.toLong)
      }
      assert(got === expected, s"round $round mismatch")
    }
  }

  test("simhashDedup finds every pair the brute-force hamming scan finds (recall)") {
    val vocab = Array("spark", "query", "table", "join", "scan", "batch", "row",
      "sort", "hash", "merge")
    for (round <- 1 to 2) {
      val docs = (1 to 40).map { i =>
        val len = 10 + rnd.nextInt(20)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val sketches = Dedup.simhashSketch(df)
        .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
      val bruteForce = (for {
        (ia, _) <- docs; (ib, _) <- docs if ia < ib
        h = java.lang.Long.bitCount(sketches(ia) ^ sketches(ib)) if h <= 3
      } yield (ia, ib)).toSet
      val got = Dedup.simhashDedup(df, maxHamming = 3)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got === bruteForce, s"round $round: pigeonhole blocking lost pairs")
    }
  }

  test("ngramJaccard matches the all-pairs reference on random corpora") {
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    for (round <- 1 to 3) {
      val docs = (1 to 30).map { i =>
        val len = 4 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val threshold = 0.3
      val got = Dedup.ngramJaccard(df, n = 2, threshold = threshold)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap

      def grams(text: String): Set[String] = {
        val t = text.trim.split("\\s+").toSeq
        if (t.size < 2) Set(t.mkString(" "))
        else t.sliding(2).map(_.mkString(" ")).toSet
      }
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        ga = grams(ta); gb = grams(tb)
        j = (ga intersect gb).size.toDouble / (ga union gb).size
        if j >= threshold
      } yield (ia, ib) -> j).toMap

      assert(got.keySet === expected.keySet, s"round $round pair-set mismatch")
      got.foreach { case (p, j) =>
        assert(math.abs(j - expected(p)) < 1e-12, s"round $round value mismatch at $p")
      }
    }
  }

  test("GlobalRank matches window rank/ntile on random tied data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (round <- 1 to 3) {
      val n = 50 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(7)
      // small value domain forces heavy ties
      val rows = (1 to n).map(i => (i.toLong, rnd.nextInt(12).toDouble))
      val df = rows.toDF("id", "v")

      val prDist = graft.operators.GlobalRank.rankDist(df, "v").collect()
        .map(r => r.getAs[Long]("id") -> ((r.getAs[Double]("pct_rank"), r.getAs[Double]("cume")))).toMap
      val w = Window.orderBy("v")
      val prWin = df.select(col("id"), percent_rank().over(w).as("p"), cume_dist().over(w).as("c"))
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      assert(prDist === prWin, s"rankDist round $round (n=$n)")

      val tiles = graft.operators.GlobalRank.ntileByRange(df, k, Seq("v", "id"), "t")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("t")).toMap
      val tilesWin = df.withColumn("t", ntile(k).over(Window.orderBy("v", "id")))
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(tiles === tilesWin, s"ntile round $round (n=$n k=$k)")
    }
  }
}
