package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) = {
    val df = rows.map { case (id, t) => (id, t, t.length) }
      .toDF("doc_id", "text", "n_chars")
    TextOps.repetition(df).collect().map(r => r.getLong(0) -> r).toMap
  }

  test("duplicate lines are counted by occurrence and by character mass") {
    val out = run(Seq(
      1L -> "alpha beta\nalpha beta\ngamma",          // line "alpha beta" ×2
      2L -> "one\ntwo\nthree"))                        // all lines unique
    val d1 = out(1L)
    assert(d1.getAs[Int]("n_lines") === 3)
    // 1 of 3 lines is a repeat occurrence
    assert(d1.getAs[Double]("dup_line_frac") === 1.0 / 3)
    // repeated chars: one extra "alpha beta" (10 chars) of 25 total line chars
    assert(d1.getAs[Double]("dup_line_char_frac") === 10.0 / 25)
    val d2 = out(2L)
    assert(d2.getAs[Double]("dup_line_frac") === 0.0)
    assert(d2.getAs[Double]("dup_line_char_frac") === 0.0)
  }

  test("2-gram repetition mass flags a degenerate looping document") {
    val loop = Seq.fill(20)("spam ham").mkString(" ") // "spam ham spam ham …"
    // the clean doc must be long enough that its single heaviest 2-gram
    // stays under the 20% mass threshold (short texts trip it trivially)
    val out = run(Seq(1L -> loop,
      2L -> "alpha bravo charlie delta echoes foxtrot golfer hotels indigo juliet kilos limas"))
    assert(!out(1L).getAs[Boolean]("repetition_keep"))
    assert(out(2L).getAs[Boolean]("repetition_keep"))
    // every adjacent pair in the loop doc repeats → dup mass covers ~all chars
    assert(out(1L).getAs[Double]("dup_2gram_frac") > 0.6)
    assert(out(2L).getAs[Double]("dup_2gram_frac") === 0.0)
  }

  test("duplicate token fraction and edge cases (empty / single-token doc)") {
    val out = run(Seq(
      1L -> "x x x x",   // 4 tokens, 1 distinct
      2L -> "",          // no tokens at all
      3L -> "solo"))     // single token, no 2-grams
    assert(out(1L).getAs[Double]("dup_token_frac") === 0.75)
    assert(out(2L).getAs[Int]("n_tokens") === 0)
    assert(out(2L).getAs[Double]("dup_token_frac") === 0.0)
    assert(out(2L).getAs[Boolean]("repetition_keep"))
    assert(out(3L).getAs[Double]("top_2gram_frac") === 0.0)
  }

  test("top 2-gram mass is the char mass of the heaviest gram") {
    // "b c" occurs twice (len 3, mass 6); "a b" once (mass 3)
    val out = run(Seq(1L -> "a b c b c"))
    assert(out(1L).getAs[Double]("top_2gram_frac") === 6.0 / 9)
  }

  test("c4LineFilter applies the published line heuristics") {
    val text = Seq(
      "This sentence has enough words and ends properly.",   // keep
      "Too short.",                                          // < 5 words
      "function() { return 1; }",                            // brace marker
      "Please enable JavaScript to view this page.",         // javascript
      "Lorem ipsum dolor sit amet consectetur.",             // lorem ipsum
      "A trailing line without terminal punctuation at all"  // no punct
    ).mkString("\n")
    val df = Seq((1L, text, text.length.toLong),
      (2L, "no lines survive here", 21L)).toDF("doc_id", "text", "n_chars")
    val out = graft.text.TextOps.c4LineFilter(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("clean_text") ===
      "This sentence has enough words and ends properly.")
    assert(out(1L).getAs[Int]("n_lines_kept") === 1)
    assert(out(1L).getAs[Int]("n_lines_dropped") === 5)
    assert(out(1L).getAs[Boolean]("c4_keep"))
    assert(!out(2L).getAs[Boolean]("c4_keep"))
    assert(out(2L).getAs[String]("clean_text") === "")
  }
}
