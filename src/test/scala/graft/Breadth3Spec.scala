package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Breadth3
import graft.io.Tables

class Breadth3Spec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: stage counts are monotone non-increasing and order-aware") {
    // u1 completes the funnel; u2 clicks BEFORE viewing (must not count
    // as stage 2); u3 views only.
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Breadth3.funnel(events).as[(String, Long)].collect().toMap
    assert(got === Map("1_view" -> 3L, "2_click" -> 1L, "3_purchase" -> 1L))

    val real = Breadth3.funnel(Tables.events(spark, sfDir))
      .orderBy("stage").as[(String, Long)].collect()
    assert(real.map(_._2).sliding(2).forall(p => p(0) >= p(1)),
      s"funnel must narrow: ${real.mkString(", ")}")
  }

  test("retention: offset-0 cell equals cohort size, offsets non-negative") {
    val r = Breadth3.retention(Tables.events(spark, sfDir))
    assert(r.filter($"day_offset" < 0).isEmpty)
    val cohortSizes = Breadth3.retention(Tables.events(spark, sfDir))
      .filter($"day_offset" === 0)
    // every user is active on their own cohort day by construction, so
    // summing the offset-0 cells recovers the distinct-user count
    val total = cohortSizes.agg(sum("n_users")).as[Long].head()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(total === users)
  }

  test("scd2: periods chain, don't overlap, one current row per customer") {
    val orders = Seq(
      (10L, 1L, "O", ts("1995-01-01 00:00:00")),
      (11L, 1L, "O", ts("1995-02-01 00:00:00")),
      (12L, 1L, "F", ts("1995-03-01 00:00:00")),
      (13L, 1L, "O", ts("1995-04-01 00:00:00")),
      (14L, 2L, "P", ts("1995-01-15 00:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
    val hist = Breadth3.scd2StatusHistory(orders)
      .orderBy("o_custkey", "eff_from")
      .as[(Long, String, Date, Date, Int)].collect()
    val c1 = hist.filter(_._1 == 1L)
    assert(c1.map(_._2).toSeq === Seq("O", "F", "O"))
    // chained: each eff_to equals the next row's eff_from
    assert(c1.sliding(2).forall { case Array(a, b) => a._4 == b._3 })
    assert(hist.count(_._5 == 1) === 2) // one open row per customer
    assert(c1.last._4.toString === "9999-12-31")
  }

  test("tfidf: ubiquitous tokens score zero, distinctive tokens rank first") {
    val docs = Seq(
      (1L, "alpha common common"),
      (2L, "beta common"),
      (3L, "gamma common")
    ).toDF("doc_id", "text")
    val got = Breadth3.tfidf(docs).orderBy("doc_id", "rnk")
      .as[(Long, String, Long, Double, Int)].collect()
    // 'common' appears in all 3 docs → idf = ln(1) = 0
    assert(got.filter(_._2 == "common").forall(_._4 === 0.0))
    val top = got.filter(_._5 == 1).map(r => r._1 -> r._2).toMap
    assert(top === Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    // at most 3 terms per doc on the real corpus
    val perDoc = Breadth3.tfidf(Tables.documents(spark, sfDir))
      .groupBy("doc_id").count().agg(max("count")).as[Long].head()
    assert(perDoc <= 3)
  }

  test("fuzzy pairs: finds near-identical names inside a block only") {
    val part = Seq(
      (1L, "small ring", "Brand#1"),
      (2L, "small rign", "Brand#1"),  // dist 2 (transposition = 2 substitutions)
      (3L, "small ring", "Brand#2"),  // other block — must not pair with 1
      (4L, "totally different", "Brand#1")
    ).toDF("p_partkey", "p_name", "p_brand")
    val got = Breadth3.fuzzyNamePairs(part)
      .select("key_a", "key_b", "dist").as[(Long, Long, Int)].collect()
    assert(got.toSet === Set((1L, 2L, 2)))
  }

  test("sliding windows: every event lands in exactly two windows") {
    val ev = Tables.events(spark, sfDir)
    val assigned = Breadth3.slidingEventCounts(ev).agg(sum("n_events")).as[Long].head()
    assert(assigned === 2 * ev.count())
    // windows are exactly 1 hour and start on the 30-min grid
    val bad = Breadth3.slidingEventCounts(ev)
      .filter(unix_timestamp($"win_end") - unix_timestamp($"win_start") =!= 3600 ||
        unix_timestamp($"win_start") % 1800 =!= 0)
    assert(bad.isEmpty)
  }

  test("histogram: bins partition all orders, ids in [0, 20)") {
    val ord = Tables.orders(spark, sfDir)
    val h = Breadth3.priceHistogram(ord).collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(h.map(_._2).sum === ord.count())
    assert(h.forall { case (b, _) => b >= 0 && b < 20 })
  }

  test("int8 quantization: values bounded, max element hits ±127, zero vector safe") {
    val fixture = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = graft.similarity.Ann.quantizeInt8(fixture)
      .orderBy("vec_id").as[(Long, Double, String)].collect()
    assert(got(0)._3.split(",").map(_.toInt).toSeq === Seq(64, -127, 32))
    assert(got(1)._2 === 0.0 && got(1)._3 === "0,0,0")
    val real = graft.similarity.Ann.quantizeInt8(Tables.embeddings(spark, sfDir))
    val qmax = real.select(max(array_max(transform(
      split($"q_csv", ","), x => abs(x.cast("int")))))).as[Int].head()
    assert(qmax === 127) // the max-|x| element always quantizes to ±127
  }

  test("transitions: probabilities sum to 1 per from-state, order-aware") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "click"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "view"),
      (4L, 2L, ts("2024-01-01 10:00:00"), "view"),
      (5L, 2L, ts("2024-01-01 10:03:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Breadth3.eventTransitions(events)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === Set(
      ("view", "click", 1L, 0.5), ("view", "purchase", 1L, 0.5),
      ("click", "view", 1L, 1.0)))
    val real = Breadth3.eventTransitions(Tables.events(spark, sfDir))
      .groupBy("from_type").agg(sum("prob").as("s")).as[(String, Double)].collect()
    assert(real.forall { case (_, s) => math.abs(s - 1.0) < 1e-9 })
  }

  test("revenue share sums to 1 across nations") {
    val r = Breadth3.nationRevenueShare(Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir))
    val s = r.agg(sum("share")).as[Double].head()
    assert(math.abs(s - 1.0) < 1e-9)
    assert(r.filter($"share" <= 0 || $"share" >= 1).isEmpty)
  }

  test("histogram on a constant column puts everything in bin 0") {
    val const = Seq.fill(10)(42.0).toDF("o_totalprice")
    val h = Breadth3.priceHistogram(const).as[(Int, Long)].collect()
    assert(h.toSeq === Seq((0, 10L)))
  }

  test("global shuffle is a permutation and reproducible across runs") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val n = docs.count()
    val a = Breadth3.globalShuffle(docs).select("doc_id", "shuffle_pos")
      .as[(Long, Long)].collect().sortBy(_._1)
    val b = Breadth3.globalShuffle(docs).select("doc_id", "shuffle_pos")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)                       // reproducible
    assert(a.map(_._2).sorted.toSeq === (1L to n))    // exact permutation
    // a different seed yields a different order
    val c = Breadth3.globalShuffle(docs, seed = "epoch2")
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(c.map(_._2).toSeq !== a.map(_._2).toSeq)
  }

  test("map round-trip preserves the daily count relation") {
    val direct = Tables.events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n")).collect().map(_.toSeq).toSet
    val viaMap = Breadth3.dailyCountMaps(Tables.events(spark, sfDir))
      .collect().map(_.toSeq).toSet
    assert(viaMap === direct)
  }

  test("hashSplit: near-nominal proportions, stable under corpus growth") {
    import graft.operators.Sampling
    val small = spark.range(1, 2001).toDF("doc_id")
    val big = spark.range(1, 10001).toDF("doc_id")
    val s = Sampling.hashSplit(small, "doc_id").as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(big, "doc_id").as[(Long, String)].collect().toMap
    // growth never reassigns an existing doc
    assert(s.forall { case (id, sp) => b(id) == sp })
    val frac = s.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05)
    assert(math.abs(frac("val") - 0.1) < 0.03)
    assert(math.abs(frac("test") - 0.1) < 0.03)
    // a different seed reshuffles membership
    val s2 = Sampling.hashSplit(small, "doc_id", seed = "fold2")
      .as[(Long, String)].collect().toMap
    assert(s.exists { case (id, sp) => s2(id) != sp })
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(small, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("mixSources keeps sources at their configured rates, stable on growth") {
    import graft.operators.Sampling
    val mk = (n: Long) => spark.range(1, n + 1).toDF("doc_id")
      .withColumn("source",
        when($"doc_id" % 2 === 0, "a").otherwise("b"))
    val rates = Map("a" -> 1.0, "b" -> 0.25)
    val small = Sampling.mixSources(mk(4000), "source", "doc_id", rates)
      .as[(Long, String)].collect()
    val aFrac = small.count(_._2 == "a") / 2000.0
    val bFrac = small.count(_._2 == "b") / 2000.0
    assert(aFrac === 1.0)                      // rate-1.0 source fully kept
    assert(math.abs(bFrac - 0.25) < 0.05)
    // survivors of the small corpus all survive in the bigger corpus
    val big = Sampling.mixSources(mk(8000), "source", "doc_id", rates)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(small.map(_._1).forall(big.contains))
    // unknown sources are dropped
    val unk = Sampling.mixSources(
      Seq((1L, "mystery")).toDF("doc_id", "source"), "source", "doc_id", rates)
    assert(unk.isEmpty)
  }

  test("label centroids track the naive float mean within quantization error") {
    val emb = Tables.embeddings(spark, sfDir)
    val got = graft.similarity.Ann.labelCentroids(emb)
      .as[(Int, Int, Double, Long)].collect()
    assert(got.length === emb.select("label").distinct().count() * 64)
    val naive = emb
      .select($"label", posexplode($"embedding".cast("array<double>")).as(Seq("pos", "x")))
      .groupBy($"label", ($"pos" + 1).cast("int").as("dim"))
      .agg(avg("x").as("m"))
      .as[(Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.forall { case (l, d, c, _) => math.abs(c - naive((l, d))) < 1e-8 })
  }

  test("l2Normalize: unit norms, zero vectors preserved") {
    val fixture = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = graft.similarity.Ann.l2Normalize(fixture)
      .orderBy("vec_id").as[(Long, Double, String)].collect()
    assert(got(0)._2 === 5.0)                    // ‖(3,4)‖ = 5
    assert(got(0)._3 === "600000,800000")        // (0.6, 0.8) in micro-units
    assert(got(1)._2 === 0.0 && got(1)._3 === "0,0")
    // real corpus: every unit vector has micro-norm ~1e6
    val real = graft.similarity.Ann.l2Normalize(Tables.embeddings(spark, sfDir))
    val worst = real.select(max(abs(
      aggregate(transform(split($"unit_micro_csv", ","),
        s => s.cast("long") * s.cast("long")), lit(0L), (a, x) => a + x)
        - lit(1000000000000L)))).as[Long].head()
    assert(worst < 200000000L, s"unit-norm drift too large: $worst") // |q|^2 within 2e8 of 1e12
  }

  test("salted revenue equals the plain-join aggregate") {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val salted = Breadth3.saltedRevenue(li, ord)
      .orderBy("o_orderpriority").as[(String, Double, Long)].collect()
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(($"l_extendedprice".cast("decimal(18,2)")
          * (lit(1) - $"l_discount".cast("decimal(18,2)"))).cast("decimal(18,4)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority").as[(String, Double, Long)].collect()
    assert(salted === plain)
  }

  test("ohlcBars: open/close follow (ts, event_id) order, bounds exact") {
    val t0 = 1700000100L // epoch seconds, inside a 15-min bucket
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      (1L, ts(t0 + 10), "m", 5.0),
      (2L, ts(t0 + 20), "m", 9.0),
      (3L, ts(t0 + 20), "m", 2.0),  // same ts as #2: id breaks the tie
      (4L, ts(t0 + 1000), "m", 7.0) // next 15-min bar
    ).toDF("event_id", "ts", "event_type", "value")
    val bars = graft.analytics.Breadth3.ohlcBars(ev)
      .orderBy("bar_start").collect()
    assert(bars.length === 2)
    val b1 = bars(0)
    assert(b1.getAs[Long]("n_events") === 3)
    assert(b1.getAs[Double]("open") === 5.0)
    assert(b1.getAs[Double]("close") === 2.0) // id 3 is last at the tied ts
    assert(b1.getAs[Double]("high") === 9.0 && b1.getAs[Double]("low") === 2.0)
    val b2 = bars(1)
    assert(b2.getAs[Double]("open") === 7.0 && b2.getAs[Double]("close") === 7.0)
  }
}
