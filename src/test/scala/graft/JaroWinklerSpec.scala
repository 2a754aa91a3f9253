package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JaroWinkler, StringFunctions}
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic reference values (Winkler's own test pairs)") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    // below the 0.7 boost threshold: prefix must NOT boost
    assert(math.abs(jw("ABCDEF", "ABZZZZZZZZ") - 0.5111111111111111) < 1e-12)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
  }

  test("degenerate inputs follow the DuckDB convention") {
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("ab", "ba") === 0.0) // window 0: no cross-position matches
  }

  test("expression works under CODEGEN_ONLY and matches interpreted eval") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val pairs = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("", "x"))
        .toDF("a", "b")
      val got = pairs.select(
        StringFunctions.jaro_winkler($"a", $"b").as("j1"),
        StringFunctions.jaro_winkler($"b", $"a").as("j2"))
        .as[(Double, Double)].collect()
      assert(math.abs(got(0)._1 - 0.9611111111111111) < 1e-12)
      assert(got.forall { case (x, y) => x === y }) // symmetric
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("jaro_winkler is callable from spark.sql after registration") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS j").collect()
    assert(math.abs(r.head.getDouble(0) - 0.9611111111111111) < 1e-12)
  }

  test("null inputs propagate null") {
    val df = Seq((Some("a"), None: Option[String])).toDF("a", "b")
    val r = df.select(StringFunctions.jaro_winkler($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }
}
