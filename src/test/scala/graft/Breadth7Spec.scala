package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.lit

import graft.analytics.Breadth7

class Breadth7Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Orders fixture: month m (0-based) gets `counts(m)` orders of
    * `price` dollars each, priority `prio`. */
  private def monthlyOrders(counts: Seq[Int], price: Double = 10.0,
                            prio: String = "1-URGENT",
                            status: String = "O") = {
    val rows = counts.zipWithIndex.flatMap { case (n, m) =>
      val ym = f"${2024 + m / 12}-${m % 12 + 1}%02d-15"
      (0 until n).map(i => (m * 1000L + i, ym, price, prio, status))
    }
    rows.toDF("o_orderkey", "ds", "o_totalprice", "o_orderpriority",
        "o_orderstatus")
      .withColumn("o_orderdate", $"ds".cast("timestamp")).drop("ds")
      .withColumn("o_custkey", $"o_orderkey" % 7)
  }

  test("kendall tau: equal-price orders make revenue track count — tau_b = 1") {
    // counts strictly increase, so every month pair is concordant
    val out = Breadth7.kendallTau(monthlyOrders(Seq(1, 2, 3, 4, 5)))
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(out.length === 1)
    val (_, nMonths, nPairs, conc, disc, tau) = out.head
    assert(nMonths === 5L && nPairs === 10L)
    assert(conc === 10L && disc === 0L && tau === 1.0)
  }

  test("kendall tau: reversing revenue against count flips the sign") {
    // counts rise but price falls fast enough that revenue strictly falls
    val rows = Seq((1, 100.0), (2, 40.0), (3, 20.0), (4, 10.0))
      .zipWithIndex.flatMap { case ((n, p), m) =>
        (0 until n).map(i => (m * 1000L + i, f"2024-${m + 1}%02d-15", p,
          "1-URGENT", "O"))
      }
    val df = rows.toDF("o_orderkey", "ds", "o_totalprice",
        "o_orderpriority", "o_orderstatus")
      .withColumn("o_orderdate", $"ds".cast("timestamp")).drop("ds")
    val out = Breadth7.kendallTau(df)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(out.head._6 === -1.0)
  }

  test("kendall tau: a fully tied series emits NULL tau_b, not NaN") {
    // identical count and revenue every month: every pair has sy = sc = 0,
    // so (n_pairs - ty)(n_pairs - tc) = 0 and tau_b is undefined
    val out = Breadth7.kendallTau(monthlyOrders(Seq(2, 2, 2)))
      .select("o_orderpriority", "tau_b")
      .as[(String, Option[Double])].collect()
    assert(out.length === 1)
    assert(out.head._2.isEmpty)
  }

  test("cramers v: DECIMAL headroom guard fails loudly on overflow-scale cells") {
    // MaxAbsChiDiff is the exact integer sqrt of (10^38 - 1) / 10^3
    val lim = (BigInt(10).pow(38) - 1) / 1000
    val m = Breadth7.MaxAbsChiDiff
    assert(m * m <= lim && (m + 1) * (m + 1) > lim)
    // an associated 2x2 with 1e18-row cells drives |n*nij - ra*cb| to ~2e36:
    // the squared milli term would overflow DECIMAL(38,0) and silently NULL
    // out of the chi2 sum - the guard must throw instead
    val huge = Seq(("A", "S1", 1000000000000000000L),
      ("B", "S2", 1000000000000000000L)).toDF("a", "b", "nij")
    val ex = intercept[IllegalArgumentException] {
      Breadth7.cramersVFromCells(huge).collect()
    }
    assert(ex.getMessage.contains("headroom"))
  }

  test("cramers v: perfect association on a 2x2 gives V = 1, zero cells counted") {
    // priority decides status completely: chi2 = n, V = 1
    val a = monthlyOrders(Seq(5), prio = "A", status = "S1")
    val b = monthlyOrders(Seq(5), prio = "B", status = "S2")
    val out = Breadth7.cramersV(a.unionByName(b))
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length === 1)
    val (r, c, n, chiMilli, v) = out.head
    assert(r === 2L && c === 2L && n === 10L)
    // all four grid cells contribute exactly n/4 each (milli-quantized)
    assert(chiMilli === 10000L)
    assert(v === 1.0)
  }

  test("cramers v: independence gives chi2 = 0") {
    // both priorities split statuses in identical ratio
    val df = Seq(("A", "S1"), ("A", "S2"), ("B", "S1"), ("B", "S2"))
      .flatMap { case (p, st) => (0 until 3).map(i => (p, st, i)) }
      .toDF("o_orderpriority", "o_orderstatus", "i")
    val out = Breadth7.cramersV(df)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.head._4 === 0L && out.head._5 === 0.0)
  }

  private def li(rows: Seq[(Long, String, Double)]) =
    rows.map { case (p, d, q) => (p, d, q) }
      .toDF("l_partkey", "ds", "l_quantity")
      .withColumn("l_shipdate", $"ds".cast("timestamp")).drop("ds")

  test("xyz class: constant monthly demand is X, one-spike demand is Z") {
    val steady = (1 to 6).map(m => (1L, f"2024-$m%02d-10", 10.0))
    val spike = Seq((2L, "2024-01-10", 60.0)) ++
      (2 to 6).map(m => (2L, f"2024-$m%02d-10", 0.0))
    // part 2's zero-quantity rows still mark the months as present with
    // mq = 0 — same CV² as absent months over the same span
    val out = Breadth7.xyzClass(li(steady ++ spike))
      .as[(Long, Long, Long, Long, Double, String)].collect()
      .sortBy(_._1)
    val (p1, _, s11, s21, cv1, cls1) = out(0)
    assert(p1 === 1L && s11 === 60L && s21 === 600L)
    assert(cv1 === 0.0 && cls1 === "X")
    val (p2, _, s12, s22, cv2, cls2) = out(1)
    // span 6 months: cv2 = (6*3600 - 3600)/3600 = 5
    assert(p2 === 2L && s12 === 60L && s22 === 3600L)
    assert(cv2 === 5.0 && cls2 === "Z")
  }

  test("xyz class: boundary CV^2 = 1/4 classifies X by the integer inequality") {
    // two months of demand 3 and 1 over a 2-month span:
    // cv2 = (2*(9+1) - 16)/16 = 0.25 exactly -> X (<= is inclusive)
    val out = Breadth7.xyzClass(li(Seq((1L, "2024-01-10", 3.0),
        (1L, "2024-02-10", 1.0))))
      .as[(Long, Long, Long, Long, Double, String)].collect()
    assert(out.head._5 === 0.25 && out.head._6 === "X")
  }

  test("xyz class: zero total demand emits NULL cv2 and NULL class, not X") {
    // part 9's quantities all round to zero: s1 = 0, CV^2 is 0/0 - the raw
    // 0 <= 0 inequality would misfile it under X (steadiest demand)
    val out = Breadth7.xyzClass(li(Seq((9L, "2024-01-10", 0.0),
        (9L, "2024-02-10", 0.2))))
      .select("part", "s1", "cv2", "xyz_class")
      .as[(Long, Long, Option[Double], Option[String])].collect()
    assert(out.length === 1)
    val (p, s1, cv2, cls) = out.head
    assert(p === 9L && s1 === 0L && cv2.isEmpty && cls.isEmpty)
  }

  test("lorenz: 10 single-customer deciles accumulate exact revenue shares") {
    val rows = (1 to 10).map(i => (i.toLong, i.toLong, i * 1.0))
    val df = rows.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderdate", lit("2024-01-15").cast("timestamp"))
    val out = Breadth7.lorenzCurve(df)
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.length === 10)
    assert(out.map(_._2).forall(_ === 1L))
    // revenue i dollars = 100i cents; cum share at decile d = d(d+1)/110
    out.foreach { case (d, _, dc, cc, share) =>
      assert(dc === d * 100L)
      assert(cc === (1 to d).map(_ * 100L).sum)
      assert(math.abs(share - d * (d + 1) / 110.0) < 1e-6)
    }
  }

  test("rolling regression: exact linear cents give the exact slope") {
    // revenue rises by exactly $1 (100 cents) per month
    val rows = (1 to 8).map(m => (m.toLong, f"2024-$m%02d-15",
      m * 1.0, "1-URGENT", "O"))
    val df = rows.toDF("o_orderkey", "ds", "o_totalprice",
        "o_orderpriority", "o_orderstatus")
      .withColumn("o_orderdate", $"ds".cast("timestamp")).drop("ds")
    val out = Breadth7.rollingRegression(df, months = 4)
      .select("month_start", "n", "slope_micro")
      .as[(java.sql.Date, Long, Option[Long])].collect()
      .sortBy(_._1.getTime)
    assert(out.head._2 === 1L && out.head._3.isEmpty) // den = 0 at n = 1
    out.tail.foreach { case (_, n, slope) =>
      assert(n >= 2L && slope.contains(100L * 1000000L))
    }
  }

  test("rolling regression: determinism across partitionings") {
    val rows = (1 to 12).map(m => (m.toLong, f"2024-$m%02d-15",
      (m * m % 7) * 13.25 + 5.0, "2-HIGH", "F"))
    val df = rows.toDF("o_orderkey", "ds", "o_totalprice",
        "o_orderpriority", "o_orderstatus")
      .withColumn("o_orderdate", $"ds".cast("timestamp")).drop("ds")
    val a = Breadth7.rollingRegression(df, months = 3)
      .collect().map(_.toString).sorted.toSeq
    val b = Breadth7.rollingRegression(df.repartition(7), months = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
