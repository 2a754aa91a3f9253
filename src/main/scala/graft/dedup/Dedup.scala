package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deduplication operators for training-data pipelines (BASELINE.json
  * north star). Four families, in increasing fuzziness:
  *
  *  1. exact        — content-hash group-by (one shuffle of 32-byte keys)
  *  2. minhash LSH  — shingle → minhash signature → banded bucket join
  *  3. simhash      — 64-bit bitwise sketch → chunk-banded hamming join
  *  4. n-gram Jaccard — inverted-index pair join with exact similarity
  *
  * Scale design: nothing here ever shuffles full document text except the
  * inverted-index verify stage (which shuffles shingles, the standard
  * trade); candidate generation always goes through fixed-width sketches,
  * so the shuffle volume per 100 TB of text is GBs, not TBs. All logic is
  * built-in expressions (higher-order array functions + xxhash64/sha2) —
  * fully codegen'd, no UDFs, no driver-side state.
  */
object Dedup {

  /** Exact dedup by SHA-256 of the text: one row per distinct content with
    * the surviving (minimum) doc_id and the copy count. Grouping on the
    * 64-hex-char digest rather than the text keeps the shuffle narrow at
    * scale; SHA-256 collisions are not a practical concern.
    */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(sha2(col("text"), 256).as("text_sha"))
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_copies"))

  // ---------------------------------------------------------------- minhash

  private val MersennePrime31 = 2147483647L // 2^31 - 1

  /** Deterministic (a, b) hash-family seeds, fixed RNG seed. */
  private def seeds(n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)((rnd.nextInt(Int.MaxValue - 2).toLong + 1,
                 rnd.nextInt(Int.MaxValue - 1).toLong))
  }

  /** Distinct word n-gram shingles of a token array (short docs collapse to
    * one whole-document shingle).
    */
  def wordShingles(toks: Column, n: Int): Column = {
    val grams = when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
    array_distinct(grams)
  }

  /** (doc_id, shingles, signature): minhash signature of `numHashes` mins
    * over the universal-hash family g_i(x) = (a_i·x + b_i) mod (2^31-1),
    * x = xxhash64(shingle) folded into [0, 2^31-1). Products stay < 2^62,
    * so the arithmetic never overflows a long.
    */
  def minhashSignatures(documents: DataFrame, shingleN: Int, numHashes: Int): DataFrame = {
    val shingles = wordShingles(TextOps.tokens(col("text")), shingleN)
    val folded = transform(shingles, s => pmod(xxhash64(s), lit(MersennePrime31)))
    val sig = array(seeds(numHashes).map { case (a, b) =>
      array_min(transform(folded, h => pmod(h * a + b, lit(MersennePrime31))))
    }: _*)
    documents.select(col("doc_id"), shingles.as("shingles"), sig.as("signature"))
  }

  /** MinHash+LSH near-duplicate pairs: signatures are sliced into `bands`
    * bands of numHashes/bands rows; docs sharing any band-hash become
    * candidates (bucket self-join on the 8-byte band hash); candidates are
    * then verified with exact Jaccard over their shingle sets. Returns
    * (doc_a, doc_b, jaccard) with jaccard ≥ threshold, doc_a < doc_b.
    */
  def minhashDedup(documents: DataFrame, shingleN: Int = 3, numHashes: Int = 32,
                   bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sigs = minhashSignatures(documents, shingleN, numHashes)

    val banded = sigs.select(col("doc_id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), xxhash64(slice(col("signature"), b * r + 1, r)).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))

    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val sets = sigs.select(col("doc_id"), col("shingles"))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------- simhash

  /** 64-bit SimHash per document: tokens are hashed, each hash votes ±1 on
    * every bit position, sign of the vote sum sets the bit. Implemented as
    * explode → 64-buffer hash aggregation (distributed, partial-agg
    * friendly) rather than per-row array loops.
    */
  def simhashSketch(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("token"))
      .select(col("doc_id"), xxhash64(col("token")).as("h"))
    val bitSums = tok.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      (0 until 64).map { j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"b$j")
      }: _*)
    val sim = (0 until 64).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)): Column
    }.reduce(_ bitwiseOR _)
    bitSums.select(col("doc_id"), sim.as("simhash"), col("n_tokens"))
  }

  /** SimHash near-duplicate pairs with hamming distance ≤ maxHamming.
    * Pigeonhole blocking: the 64-bit sketch splits into 4 16-bit chunks —
    * any pair within hamming ≤ 3 shares at least one exact chunk, so the
    * candidate join is an equi-join on (chunk index, chunk value), never a
    * cross join.
    */
  def simhashDedup(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk blocking guarantees recall only to hamming 3")
    val sk = simhashSketch(documents).select(col("doc_id"), col("simhash"))
    val chunked = sk.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("cv"))
      }: _*)).as("cc"))
      .select(col("doc_id"), col("simhash"),
        col("cc.chunk").as("chunk"), col("cc.cv").as("cv"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard similarity via inverted index: explode distinct
    * bigrams, equi-join on the gram to count shared grams per pair, then
    * |A∩B| / (|A| + |B| − |A∩B|). The gram join is the standard
    * set-similarity plan — shuffle keys are grams, and a stop-gram cap
    * (`maxDocsPerGram`) bounds worst-case skew the way frequency filters do
    * in published set-similarity joins.
    */
  def ngramJaccard(documents: DataFrame, n: Int = 2, threshold: Double = 0.3,
                   maxDocsPerGram: Int = 10000): DataFrame = {
    val grams = documents.select(col("doc_id"),
      wordShingles(TextOps.tokens(col("text")), n).as("grams"))
    val sizes = grams.select(col("doc_id"), size(col("grams")).as("n_grams"))
    val inv = grams.select(col("doc_id"), explode(col("grams")).as("gram"))
    // stop-gram cap: drop grams occurring in more docs than the cap (they
    // generate O(df^2) pairs and carry no discriminative signal)
    val rare = inv.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocsPerGram).select("gram")
    val filtered = inv.join(rare, "gram")
    val shared = filtered.as("a")
      .join(filtered.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_grams").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_grams").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
