package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.io.Tables
import graft.similarity.Ann

class VectorExprSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("native cosine_sim is bit-identical to the fold composition") {
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .limit(5000)
      .select(
        VectorFunctions.cosine_sim($"a.v", $"b.v").as("native"),
        Ann.cosineFold($"a.v", $"b.v").as("fold"))
    assert(pairs.filter($"native" =!= $"fold").count() === 0)
  }

  test("cosine_sim: known values, zero-norm yields null, float input widens") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)), // orthogonal → 0
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)), // parallel → 1
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))  // zero norm → null
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine_sim($"a", $"b")).as[Option[Double]].collect()
    assert(math.abs(got(0).get - 0.0) < 1e-12)
    assert(math.abs(got(1).get - 1.0) < 1e-12)
    assert(got(2).isEmpty)
  }

  test("cosine_sim: a null element in either array yields null") {
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(1.0), Some(2.0))),
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](None, Some(2.0))),
      (Seq[Option[Double]](Some(1.0), Some(0.0)), Seq[Option[Double]](Some(1.0), Some(0.0)))
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine_sim($"a", $"b")).as[Option[Double]].collect()
    assert(got(0).isEmpty && got(1).isEmpty)
    assert(math.abs(got(2).get - 1.0) < 1e-12)
    // same via spark.sql → exercises the codegen path independently
    VectorFunctions.register(spark)
    val sqlGot = spark.sql(
      "SELECT cosine_sim(array(1.0d, cast(null as double)), array(1.0d, 2.0d))")
      .as[Option[Double]].head()
    assert(sqlGot.isEmpty)
  }

  test("SQL registration: cosine_sim usable from spark.sql") {
    VectorFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb")
    val n = spark.sql(
      """SELECT cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                  CAST(b.embedding AS ARRAY<DOUBLE>)) AS c
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |LIMIT 100""".stripMargin).filter("c IS NOT NULL").count()
    assert(n === 100)
  }

  test("two cosine_sim calls in one projection survive CODEGEN_ONLY mode") {
    // regression: fixed local names in doGenCode collided when two
    // instances landed in the same generated function, failing janino
    // compilation and silently falling back to interpreted projection
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val e = Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val out = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id").limit(100)
        .select(
          VectorFunctions.cosine_sim($"a.v", $"b.v").as("c1"),
          VectorFunctions.cosine_sim($"b.v", $"a.v").as("c2"))
        .collect()
      assert(out.nonEmpty)
      assert(out.forall(r => r.getDouble(0) == r.getDouble(1)))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
