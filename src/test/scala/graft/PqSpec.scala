package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.similarity.Pq

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, TestSpark.sfDir)

  test("fit is deterministic and shapes are right") {
    val m1 = Pq.fit(emb, m = 8, kCodes = 16, iters = 2)
    val m2 = Pq.fit(emb, m = 8, kCodes = 16, iters = 2)
    assert(m1.m === 8 && m1.kCodes === 16 && m1.dim === 64)
    for (j <- 0 until 8; c <- 0 until 16)
      assert(m1.codebooks(j)(c).toSeq === m2.codebooks(j)(c).toSeq, s"book $j code $c")
  }

  test("encode: codes in range, deterministic, one per subspace") {
    val model = Pq.fit(emb, m = 8, kCodes = 16, iters = 2)
    val enc = Pq.encode(emb, model).cache()
    assert(enc.count() === emb.count())
    assert(enc.filter(size($"codes") =!= 8).count() === 0)
    assert(enc.filter(array_min($"codes") < 0 || array_max($"codes") >= 16).count() === 0)
    val enc2 = Pq.encode(emb, model)
    assert(enc.exceptAll(enc2).isEmpty)
    enc.unpersist()
  }

  test("training reduces quantization error vs the seed codebooks") {
    def mse(model: Pq.Model): Double = {
      val recon = model.codebooks.zipWithIndex.map { case (cents, j) =>
        val sub = slice($"v", j * model.subDim + 1, model.subDim)
        val cands = cents.zipWithIndex.map { case (c, ci) =>
          struct(
            round(aggregate(zip_with(sub, array(c.map(lit): _*), (x, y) => (x - y) * (x - y)),
              lit(0.0), (a, d) => a + d), 6).as("d"), lit(ci).as("cid"))
        }
        least(cands: _*).getField("d")
      }.reduce(_ + _)
      emb.select($"embedding".cast("array<double>").as("v"))
        .agg(avg(recon)).head().getDouble(0)
    }
    val untrained = Pq.fit(emb, m = 8, kCodes = 16, iters = 0)
    val trained = Pq.fit(emb, m = 8, kCodes = 16, iters = 2)
    assert(mse(trained) < mse(untrained), "Lloyd iterations must reduce MSE")
  }

  test("pqChecked: every verdict true on the fixture") {
    val rows = Pq.pqChecked(emb).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(1) === 10L, "candidate cardinality")
      assert(r.getBoolean(2), s"distance ratio above bound for query ${r.getLong(0)}")
      assert(r.getBoolean(3), "codes out of range")
    }
  }

  test("ivfPqChecked: verdicts true, candidates bounded, deterministic") {
    val rows = Pq.ivfPqChecked(emb).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= 10L,
        s"candidate cardinality for query ${r.getLong(0)}")
      assert(r.getBoolean(2), s"PQ distance ratio above bound for query ${r.getLong(0)}")
      assert(r.getBoolean(3), s"IVF probing ratio above bound for query ${r.getLong(0)}")
      assert(r.getBoolean(4), "codes out of range")
    }
    val again = Pq.ivfPqChecked(emb).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "composite must be a deterministic function of the corpus")
  }

  test("ivfPqChecked candidates never exceed the probed posting mass") {
    // structural IVF property: a query sees ONLY vectors whose single
    // coarse assignment is among its probed lists — n_candidates is
    // capped by topK and by the probed-list population minus self.
    import org.apache.spark.sql.expressions.Window
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, d) => s + d)
      def nrm(v: org.apache.spark.sql.Column) =
        sqrt(aggregate(zip_with(v, v, (x, y) => x * y), lit(0.0), (s, d) => s + d))
      round(dot / (nrm(a) * nrm(b)), 6)
    }
    val e = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = e.filter(pmod($"vec_id", lit(29)) === 0)
      .select($"vec_id".as("cent_id"), $"v".as("cv"))
    def nearest(points: org.apache.spark.sql.DataFrame, idCol: String,
                vCol: String, n: Int) = {
      val w = Window.partitionBy(idCol).orderBy(desc("csim"), asc("cent_id"))
      points.join(broadcast(cents))
        .select(col(idCol), col("cent_id"), cos(col(vCol), $"cv").as("csim"))
        .withColumn("crank", row_number().over(w)).filter($"crank" <= n)
        .select(idCol, "cent_id")
    }
    val assigned = nearest(e, "vec_id", "v", 1)
    val q = e.filter($"vec_id" < 10).select($"vec_id".as("query_id"), $"v".as("qv"))
    val probes = nearest(q, "query_id", "qv", 3)
    val probedMass = probes
      .join(assigned, Seq("cent_id"))
      .filter($"vec_id" =!= $"query_id")
      .groupBy("query_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Pq.ivfPqChecked(emb).collect().foreach { r =>
      val qid = r.getLong(0)
      assert(r.getLong(1) === math.min(10L, probedMass(qid)),
        s"query $qid candidate count must equal min(topK, probed mass)")
    }
  }

  test("searchTopK at nQueries=100 matches a driver-side ADC reference") {
    // the broadcast-LUT join must scale nQueries as DATA, not plan size —
    // this is the scale path the per-query literal-LUT branches could not
    // take. Reference: full ADC computed in plain Scala.
    val model = Pq.fit(emb, m = 8, kCodes = 16, iters = 1)
    val k = 3
    val got = Pq.searchTopK(emb, model, k = k, nQueries = 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(r => (r._3, r._2)).map(r => (r._2, r._3)).toSeq }
    val corpus = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val codes = corpus.map { case (id, v) => id -> Pq.assignCodes(v, model.codebooks) }.toMap
    def lutDist(qv: Array[Double], cs: Array[Int]): Double = {
      var s = 0.0
      for (j <- 0 until model.m) {
        val cent = model.codebooks(j)(cs(j))
        var i = 0
        while (i < model.subDim) {
          val d = qv(j * model.subDim + i) - cent(i); s += d * d; i += 1
        }
      }
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val queries = corpus.filter(_._1 < 100)
    assert(queries.length === 100, "fixture must hold at least 100 vectors")
    assert(got.size === 100)
    queries.foreach { case (qid, qv) =>
      val expect = corpus.filter(_._1 != qid)
        .map { case (id, _) => (id, lutDist(qv, codes(id))) }
        .sortBy { case (id, d) => (d, id) }.take(k).toSeq
      assert(got(qid) === expect, s"query $qid")
    }
  }
}
