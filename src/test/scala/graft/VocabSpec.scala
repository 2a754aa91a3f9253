package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

class VocabSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("n_chars", length($"text").cast("long"))

  test("vocab ranks by frequency desc, token asc; cut at maxSize") {
    val d = docs(1L -> "b a b c b a", 2L -> "a c")
    // counts: b=3, a=3, c=2 → ids: a=1 (tie to lexicographic), b=2, c=3
    val v = TextOps.vocab(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v === Map("a" -> ((1L, 3L)), "b" -> ((2L, 3L)), "c" -> ((3L, 2L))))
    val cut = TextOps.vocab(d, maxSize = 2).select("token").as[String].collect().toSet
    assert(cut === Set("a", "b"))
  }

  test("encodeTokens emits in-order ids, counts OOV, keeps empty docs") {
    val d = docs(1L -> "b a b c b a", 2L -> "a c", 3L -> "")
    val v = TextOps.vocab(d, maxSize = 2) // c is out-of-vocabulary
    val enc = TextOps.encodeTokens(d, v).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(enc(1L) === ((6L, 1L, "2,1,2,0,2,1")))
    assert(enc(2L) === ((2L, 1L, "1,0")))
    assert(enc(3L) === ((0L, 0L, "")))
  }

  test("encode round-trips: decoding ids through the vocab restores tokens") {
    val d = docs(1L -> "the cat sat on the mat", 2L -> "the dog sat")
    val v = TextOps.vocab(d)
    val inv = v.select("token_id", "token").as[(Long, String)].collect().toMap
    val enc = TextOps.encodeTokens(d, v)
      .select("doc_id", "token_ids").as[(Long, String)].collect().toMap
    val decoded = enc(1L).split(",").map(id => inv(id.toLong)).mkString(" ")
    assert(decoded === "the cat sat on the mat")
    assert(enc(2L).split(",").map(id => inv(id.toLong)).mkString(" ") === "the dog sat")
  }

  test("zipfSlope recovers ~-1 on a planted Zipfian corpus, deterministically") {
    // plant freq(r) = ceil(200/r) for 40 word types — a textbook Zipf
    // curve; OLS on the log-log points must land near -1
    val words = (1 to 40).flatMap(r => Seq.fill(math.ceil(200.0 / r).toInt)(s"w$r"))
    val docs = words.grouped(25).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val row = graft.text.TextOps.zipfSlope(docs).head()
    assert(row.getLong(0) === 40L)
    val slope = row.getDouble(1)
    assert(slope < -0.85 && slope > -1.15, s"slope $slope not Zipf-like")
    // partition-invariant: exact integer moments cannot drift
    val again = graft.text.TextOps.zipfSlope(docs.repartition(7)).head().getDouble(1)
    assert(again === slope)
    spark.catalog.clearCache()
  }
}
