package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Kmv
import graft.io.Tables
import graft.operators.{Ivm, SkewJoin}

/** Round-13 additions: the KMV correlated-sampling join-cardinality
  * estimator (+ sketch-dispatched salted join) and the log-bucket
  * histogram approximate-quantile IVM view.
  */
class Round13OpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  // ---------------- log-bucket histogram quantiles ----------------

  test("logBucket/logBucketLowerBound: monotone, <= 10% relative width, exact below 10") {
    val xs = Seq(0L, 1L, 9L, 10L, 11L, 99L, 100L, 101L, 954L, 1000L,
      99999L, 123456789L, 9876543210L)
    val got = xs.toDF("x")
      .select(col("x"), Ivm.logBucket(col("x")).as("b"))
      .select(col("x"), col("b"), Ivm.logBucketLowerBound(col("b")).as("lo"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // lower bound never exceeds the value; buckets are monotone in x
    got.foreach { case (x, _, lo) => assert(lo <= x, s"x=$x lo=$lo") }
    assert(got.map(_._2).sorted.sameElements(got.map(_._2)))
    // exact below 10; <= 10% relative width above
    got.foreach { case (x, _, lo) =>
      if (x < 10) assert(lo === x)
      else assert((x - lo) * 10 <= x, s"x=$x lo=$lo exceeds 10% width")
    }
  }

  test("logBucket: negative input raises loudly instead of mis-bucketing") {
    val ex = intercept[Exception] {
      Seq(-5L).toDF("x").select(Ivm.logBucket(col("x"))).collect()
    }
    assert(ex.getMessage.contains("logBucket") ||
      Option(ex.getCause).exists(_.getMessage.contains("logBucket")))
  }

  test("quantileView: p50/p95 land on the bucket holding the exact quantile") {
    // group g: values 1..100 once each -> p50 = 50 (bucket lo 50),
    // p95 = 95 (bucket lo 95); two-sig-digit buckets are EXACT here
    val df = (1 to 100).map(v => ("g", v.toLong)).toDF("g", "x")
    val support = df.select(col("g"), Ivm.logBucket(col("x")).as("bucket"))
      .groupBy("g", "bucket").agg(count(lit(1)).as("cnt"))
    val got = Ivm.quantileView(support, Seq("g"), "bucket")
      .select("n_rows", "q500000_lo", "q950000_lo")
      .as[(Long, Long, Long)].head()
    assert(got === ((100L, 50L, 95L)))
  }

  test("quantileView over applyDeltaDistinct == recompute from the merged snapshot") {
    val base = (1 to 60).map(v => ("g", (v * 7 % 100 + 1).toLong)) ++
      (1 to 40).map(v => ("h", (v * 13 % 50 + 1).toLong))
    val ins = Seq(("g", 500L, false), ("g", 501L, false), ("h", 3L, false))
    // delete rows that EXIST in base (g: 7*1%100+1=8; h: 13*1%50+1=14)
    val del = Seq(("g", 8L, true), ("h", 14L, true))
    val baseDf = base.toDF("g", "x")
      .select(col("g"), Ivm.logBucket(col("x")).as("bucket"))
      .groupBy("g", "bucket").agg(count(lit(1)).as("cnt"))
    val changes = (ins ++ del).toDF("g", "x", "is_delete")
      .select(col("g"), Ivm.logBucket(col("x")).as("bucket"), col("is_delete"))
    val maintained = Ivm.quantileView(
      Ivm.applyDeltaDistinct(baseDf, changes, Seq("g"), "bucket"),
      Seq("g"), "bucket")
    // recompute: base minus ONE occurrence of each deleted (g,x), plus inserts
    val counts = scala.collection.mutable.Map[(String, Long), Int]()
    base.foreach(r => counts(r) = counts.getOrElse(r, 0) + 1)
    del.foreach { case (g, x, _) => counts((g, x)) = counts((g, x)) - 1 }
    ins.foreach { case (g, x, _) => counts((g, x)) = counts.getOrElse((g, x), 0) + 1 }
    val merged = counts.toSeq.flatMap { case ((g, x), c) => Seq.fill(c)((g, x)) }
    val recomputed = Ivm.quantileView(
      merged.toDF("g", "x")
        .select(col("g"), Ivm.logBucket(col("x")).as("bucket"))
        .groupBy("g", "bucket").agg(count(lit(1)).as("cnt")),
      Seq("g"), "bucket")
    val a = maintained.orderBy("g").collect().toSeq
    val b = recomputed.orderBy("g").collect().toSeq
    assert(a === b)
  }

  // ---------------- KMV join-cardinality estimate ----------------

  test("joinCardinality: exact (scale 1) when the key domain fits the sketch") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.as("a").join(li.as("b"),
      col("a.l_partkey") === col("b.l_partkey")).count()
    val nKeys = li.select("l_partkey").distinct().count()
    val row = Kmv.joinCardinality(li, li, "l_partkey", "l_partkey",
      k = (nKeys + 10).toInt)
      .select("n_sampled", "est_pairs").as[(Long, Long)].head()
    assert(row._1 === nKeys)
    assert(row._2 === exact)
  }

  test("joinCardinality: sampled estimate is deterministic and in range") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.as("a").join(li.as("b"),
      col("a.l_partkey") === col("b.l_partkey")).count()
    val r1 = Kmv.joinCardinality(li, li, "l_partkey", "l_partkey", k = 16)
      .collect().head
    val r2 = Kmv.joinCardinality(li, li, "l_partkey", "l_partkey", k = 16)
      .collect().head
    assert(r1 === r2) // md5 tape -> bit-stable across runs
    val est = r1.getAs[Long]("est_pairs")
    assert(est > 0)
    // k=16 correlated sample: loose sanity band, deterministic so stable
    assert(est > exact / 4 && est < exact * 4,
      s"est $est vs exact $exact out of sanity band")
  }

  test("joinCardinality: empty inputs produce one all-zero row") {
    val e = Seq.empty[Long].toDF("k1")
    val row = Kmv.joinCardinality(e, e, "k1", "k1").collect()
    assert(row.length === 1)
    assert(row.head.getAs[Long]("est_pairs") === 0L)
    assert(row.head.getAs[String]("top_key") === "")
  }

  test("autoSaltedJoinSketch: identical row multiset on both dispatch branches") {
    // skewed: one hot key with 400 left rows -> advice salts; uniform ->
    // plain join. Both must equal the plain join's multiset.
    val hotLeft = ((1 to 400).map(_ => (1L, "h")) ++
      (2 to 50).map(i => (i.toLong, s"v$i"))).toDF("k1", "payload")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("k1", "rv")
    val plain = hotLeft.join(right, "k1")
      .select("k1", "payload", "rv").as[(Long, String, String)]
      .collect().sorted.toSeq
    val sketch = SkewJoin.autoSaltedJoinSketch(hotLeft, right, "k1")
      .select("k1", "payload", "rv").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(sketch === plain)
    // the advice itself reads the hot key and salts > 1
    val adv = Kmv.joinCardinality(hotLeft, right, "k1", "k1")
      .select("top_key", "advised_salts").as[(String, Long)].head()
    assert(adv._1 === "1")
    assert(adv._2 > 1L)
    // uniform fixture: below threshold, plain branch
    val uni = (1 to 50).map(i => (i.toLong, "u")).toDF("k1", "payload")
    val uniAdv = Kmv.joinCardinality(uni, right, "k1", "k1")
      .select("skew_x_milli").as[Long].head()
    assert(uniAdv < 4000L)
    val uniJoin = SkewJoin.autoSaltedJoinSketch(uni, right, "k1")
      .select("k1", "payload", "rv").as[(Long, String, String)]
      .collect().sorted.toSeq
    val uniPlain = uni.join(right, "k1")
      .select("k1", "payload", "rv").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(uniJoin === uniPlain)
  }
}
