package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary (sign) quantization + Hamming-distance retrieval — the 1-bit
  * rung below the shipped int8 scalar quantization and PQ codebooks on
  * the embedding-compression ladder (Charikar STOC'02 sign-random-
  * projection; the "binary quantization" mode of modern vector stores):
  * each float dimension collapses to its SIGN BIT, 64 dims pack into
  * two longs, and approximate nearest neighbors rank by Hamming
  * distance = popcount(xor) over the packed words — 32× smaller than
  * float32 and the distance kernel is two XORs and two POPCNTs.
  *
  * Exactness: the sign test is a strict float `> 0` compare, packing is
  * integer shifts/adds, distances are exact integers, and the top-k
  * window breaks ties by neighbor id — every step replays bit-equal in
  * the oracle. Words carry 32 bits each (not 64): DuckDB's checked
  * `<<` refuses `1::BIGINT << 63`, and 32-bit words sidestep the sign
  * bit in BOTH engines with zero information loss.
  *
  * Scale shape: packing is a map-only codegen projection (higher-order
  * `transform`/`aggregate` over the vector, no UDF); [[hammingTopK]]'s
  * query side is a FIXED small set (nQueries rows) so its candidate
  * join is a broadcast nested-loop — cost linear in corpus size, the
  * brute-force baseline shape of [[Ann]]. At 100 TB the packed corpus
  * is the asset: 16 B/vector instead of 256 B, so the same scan ranks
  * 16× more vectors per byte read. When the QUERY side grows
  * data-sized, [[mihTopK]] is the scale rung: multi-index Hamming
  * (Norouzi & Fleet CVPR'12) splits each signature into 16-bit bands
  * and turns retrieval into a band-value EQUI-JOIN (shuffle-partitioned
  * on the band key, never a broadcast of either side) — pigeonhole-
  * complete for radius ≤ nBands−1, with an exact popcount re-rank on
  * the candidates.
  *
  * Output: (q_id, neighbor_id, hamming, rn) — top `k` per query by
  * (hamming asc, neighbor_id asc).
  */
object BinaryQuant {

  /** Pack expression: ceil(dim/32) words of 32 sign bits each, read
    * from array column `vecCol` (1-based element_at); positions past
    * the vector length contribute 0 bits.
    */
  private def packSql(vecCol: String, dim: Int): String = {
    val nWords = (dim + 31) / 32
    s"""transform(sequence(0, ${nWords - 1}), w ->
       |  aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, b) ->
       |    acc + CASE WHEN w * 32 + b + 1 <= size($vecCol)
       |                AND element_at($vecCol, CAST(w * 32 + b + 1 AS INT))
       |                    > CAST(0 AS FLOAT)
       |               THEN shiftleft(CAST(1 AS BIGINT), b)
       |               ELSE CAST(0 AS BIGINT) END))""".stripMargin
  }

  /** Sign-packed corpus: (vec_id, words ARRAY<BIGINT>). */
  def pack(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    require(dim >= 1 && dim <= 4096, "dim must be in [1, 4096]")
    embeddings.select(col("vec_id"), expr(packSql("embedding", dim)).as("words"))
  }

  /** Top-`k` Hamming neighbors for the `nQueries` lowest vec_ids. */
  def hammingTopK(embeddings: DataFrame, dim: Int = 64, nQueries: Int = 10,
                  k: Int = 5): DataFrame = {
    require(nQueries >= 1 && k >= 1, "need queries and k")
    val packed = graft.Caching.materialize(pack(embeddings, dim))
    val queries = packed.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").as("q_id"), col("words").as("qw"))
    val dists = packed.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        expr("""aggregate(zip_with(qw, words, (a, b) -> bit_count(a ^ b)),
               |          0, (acc, x) -> acc + x)""".stripMargin).as("hamming"))
    val w = Window.partitionBy("q_id").orderBy(col("hamming").asc,
      col("neighbor_id").asc)
    dists.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"),
        col("hamming").cast("long").as("hamming"), col("rn"))
  }

  /** 16-bit band slices of the packed words: band b lives in word
    * b div 2, shifted (b % 2)·16 — bands never cross the 32-bit word
    * boundary, so extraction is one shift and one mask.
    */
  private def bandSql(wordsCol: String, nBands: Int): String =
    s"""transform(sequence(0, ${nBands - 1}), b -> named_struct(
       |  'band_idx', b,
       |  'band_val', shiftright(element_at($wordsCol, CAST(b div 2 + 1 AS INT)),
       |                         CAST((b % 2) * 16 AS INT)) & 65535))""".stripMargin

  private def hammingSql(aCol: String, bCol: String): String =
    s"""aggregate(zip_with($aCol, $bCol, (a, b) -> bit_count(a ^ b)),
       |          0, (acc, x) -> acc + x)""".stripMargin

  /** Deterministic data-sized probe set: every corpus vector with the
    * sign of dimension (vec_id mod dim) flipped — each probe is
    * guaranteed a planted neighbor (its source vector) at Hamming
    * distance ≤ 1, so radius-bounded retrieval over the synthetic
    * corpus is non-vacuous. Derivation is a pure projection of the
    * fixture (no synthesized data), replayed identically by the
    * oracle.
    */
  private def probesPacked(embeddings: DataFrame, dim: Int): DataFrame =
    pack(embeddings.select(col("vec_id"),
        expr(s"""transform(embedding, (x, i) ->
                |  CASE WHEN i = CAST(vec_id % $dim AS INT)
                |       THEN -x ELSE x END)""".stripMargin).as("embedding")),
      dim)
      .select(col("vec_id").as("q_id"), col("words").as("qw"))

  /** All (probe, corpus) pairs within Hamming `radius`, via the banded
    * candidate join + exact popcount verify. EXACT for
    * radius ≤ nBands−1 by pigeonhole: a pair whose every band differs
    * has distance ≥ nBands, so any pair within radius shares at least
    * one full band and survives the equi-join (enforced `require`, the
    * [[graft.multimodal.Multimodal]] image near-dup discipline).
    */
  private def withinRadius(embeddings: DataFrame, dim: Int,
                           radius: Int): DataFrame = {
    val nWords = (dim + 31) / 32
    val nBands = nWords * 2
    require(radius >= 0 && radius <= nBands - 1,
      s"banded candidates are only pigeonhole-complete for radius <= " +
        s"${nBands - 1} with $nBands bands (got $radius) - raise dim or " +
        "add band-enumeration probing before trusting the result")
    val packed = graft.Caching.materialize(pack(embeddings, dim))
    val probes = graft.Caching.materialize(probesPacked(embeddings, dim))
    val corpusBands = packed
      .select(col("vec_id"), explode(expr(bandSql("words", nBands))).as("b"))
      .select(col("vec_id"), col("b.band_idx").as("band_idx"),
        col("b.band_val").as("band_val"))
    val probeBands = probes
      .select(col("q_id"), explode(expr(bandSql("qw", nBands))).as("b"))
      .select(col("q_id"), col("b.band_idx").as("band_idx"),
        col("b.band_val").as("band_val"))
    // the scale path: a plain shuffle equi-join on the band key — no
    // broadcast of either side, so probes may be as large as the corpus
    val cands = probeBands.join(corpusBands, Seq("band_idx", "band_val"))
      .select(col("q_id"), col("vec_id")).distinct()
    cands.join(probes, "q_id").join(packed, "vec_id")
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        expr(hammingSql("qw", "words")).as("hamming"))
      .filter(col("hamming") <= radius)
  }

  /** Multi-index Hamming top-`k` (Norouzi & Fleet CVPR'12): radius-
    * bounded banded retrieval for EVERY probe (data-sized query side),
    * exact popcount re-rank, per-probe top-k by (hamming, neighbor_id).
    * Complete — identical to brute force within `radius` — per the
    * [[withinRadius]] pigeonhole argument; [[mihRecall]] is the
    * enforced gate on that claim.
    */
  def mihTopK(embeddings: DataFrame, dim: Int = 64, radius: Int = 3,
              k: Int = 5): DataFrame = {
    require(k >= 1, "need k >= 1")
    val w = Window.partitionBy("q_id").orderBy(col("hamming").asc,
      col("neighbor_id").asc)
    withinRadius(embeddings, dim, radius)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"),
        col("hamming").cast("long").as("hamming"), col("rn"))
  }

  /** Recall gate for [[mihTopK]] against brute-force popcount over the
    * full corpus, for the `nQueries` lowest probe ids (the bounded
    * recall-audit shape of [[Ann.recallEval]] — nQueries bounds the
    * brute cost, not the corpus). Multi-index Hamming is EXACT within
    * radius, so recall_micro must be 1000000 on every row; anything
    * less is a banding regression.
    *
    * Output: (q_id, n_brute, n_hit, recall_micro).
    */
  def mihRecall(embeddings: DataFrame, dim: Int = 64, radius: Int = 3,
                nQueries: Int = 20): DataFrame = {
    require(nQueries >= 1, "need nQueries >= 1")
    val sample = probesPacked(embeddings, dim).orderBy("q_id").limit(nQueries)
    val brute = pack(embeddings, dim).crossJoin(broadcast(sample))
      .select(col("q_id"), col("vec_id"),
        expr(hammingSql("qw", "words")).as("h"))
      .filter(col("h") <= radius)
      .select(col("q_id"), col("vec_id"))
    val mih = withinRadius(embeddings, dim, radius)
      .join(sample.select("q_id"), Seq("q_id"), "left_semi")
      .select(col("q_id"), col("neighbor_id").as("vec_id"),
        lit(true).as("__hit"))
    brute.join(mih, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_brute"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_hit"))
      .select(col("q_id"), col("n_brute"), col("n_hit"),
        expr("CAST(n_hit * 1000000 div n_brute AS LONG)").as("recall_micro"))
  }

  /** DuckDB replay of [[hammingTopK]] — identical 32-bit packing (list
    * lambdas mirror the higher-order expressions) and tie-break.
    */
  def hammingTopKOracleSql(dim: Int = 64, nQueries: Int = 10,
                           k: Int = 5): String = {
    val nWords = (dim + 31) / 32
    s"""WITH packed AS (
       |  SELECT vec_id,
       |         list_transform(range(0, $nWords), w ->
       |           list_reduce(list_transform(range(0, 32), b ->
       |             CASE WHEN w * 32 + b + 1 <= len(embedding)
       |                   AND embedding[CAST(w * 32 + b + 1 AS INT)] > 0
       |                  THEN (1::BIGINT << CAST(b AS INT))
       |                  ELSE 0::BIGINT END),
       |             (a, b) -> a + b)) AS words
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS q_id, words AS qw FROM packed
       |  ORDER BY vec_id LIMIT $nQueries),
       |d AS (
       |  SELECT q_id, p.vec_id AS neighbor_id,
       |         list_reduce(list_transform(range(0, $nWords), w ->
       |           CAST(bit_count(xor(qw[CAST(w + 1 AS INT)],
       |                              words[CAST(w + 1 AS INT)])) AS INT)),
       |           (a, b) -> a + b) AS hamming
       |  FROM packed p CROSS JOIN q WHERE p.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT q_id, neighbor_id, hamming,
       |         ROW_NUMBER() OVER (PARTITION BY q_id
       |                            ORDER BY hamming, neighbor_id) AS rn
       |  FROM d)
       |SELECT q_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming,
       |       CAST(rn AS INT) AS rn
       |FROM ranked WHERE rn <= $k""".stripMargin
  }

  /** Shared oracle CTE block: packed corpus, perturbed-probe packing,
    * band explosion for both sides, candidate equi-join, popcount
    * verify — the exact mirror of [[withinRadius]].
    */
  private def mihCtes(dim: Int, radius: Int): String = {
    val nWords = (dim + 31) / 32
    val nBands = nWords * 2
    val bandRows = (0 until nBands).map(b => s"($b)").mkString(", ")
    def packExpr(vecCol: String) =
      s"""list_transform(range(0, $nWords), w ->
         |  list_reduce(list_transform(range(0, 32), b ->
         |    CASE WHEN w * 32 + b + 1 <= len($vecCol)
         |          AND $vecCol[CAST(w * 32 + b + 1 AS INT)] > 0
         |         THEN (1::BIGINT << CAST(b AS INT))
         |         ELSE 0::BIGINT END),
         |    (a, b) -> a + b))""".stripMargin
    def hamExpr(aCol: String, bCol: String) =
      s"""list_reduce(list_transform(range(0, $nWords), w ->
         |  CAST(bit_count(xor($aCol[CAST(w + 1 AS INT)],
         |                     $bCol[CAST(w + 1 AS INT)])) AS INT)),
         |  (a, b) -> a + b)""".stripMargin
    s"""packed AS (
       |  SELECT vec_id, ${packExpr("embedding")} AS words
       |  FROM embeddings),
       |perturbed AS (
       |  SELECT vec_id AS q_id,
       |         list_transform(range(1, len(embedding) + 1), i ->
       |           CASE WHEN i - 1 = vec_id % $dim
       |                THEN -embedding[CAST(i AS INT)]
       |                ELSE embedding[CAST(i AS INT)] END) AS emb
       |  FROM embeddings),
       |qpacked AS (
       |  SELECT q_id, ${packExpr("emb")} AS qw FROM perturbed),
       |bands(band_idx) AS (VALUES $bandRows),
       |cband AS (
       |  SELECT vec_id, band_idx,
       |         (words[CAST(band_idx // 2 + 1 AS INT)]
       |          >> CAST((band_idx % 2) * 16 AS INT)) & 65535 AS band_val
       |  FROM packed CROSS JOIN bands),
       |qband AS (
       |  SELECT q_id, band_idx,
       |         (qw[CAST(band_idx // 2 + 1 AS INT)]
       |          >> CAST((band_idx % 2) * 16 AS INT)) & 65535 AS band_val
       |  FROM qpacked CROSS JOIN bands),
       |cands AS (
       |  SELECT DISTINCT q.q_id, c.vec_id
       |  FROM qband q JOIN cband c USING (band_idx, band_val)),
       |verified AS (
       |  SELECT cands.q_id, cands.vec_id AS neighbor_id,
       |         ${hamExpr("qw", "words")} AS hamming
       |  FROM cands
       |  JOIN qpacked USING (q_id)
       |  JOIN packed ON cands.vec_id = packed.vec_id),
       |within AS (
       |  SELECT q_id, neighbor_id, hamming FROM verified
       |  WHERE hamming <= $radius)""".stripMargin
  }

  /** DuckDB replay of [[mihTopK]] — identical banding, candidate join,
    * verify, and tie-break.
    */
  def mihTopKOracleSql(dim: Int = 64, radius: Int = 3, k: Int = 5): String =
    s"""WITH ${mihCtes(dim, radius)},
       |ranked AS (
       |  SELECT q_id, neighbor_id, hamming,
       |         ROW_NUMBER() OVER (PARTITION BY q_id
       |                            ORDER BY hamming, neighbor_id) AS rn
       |  FROM within)
       |SELECT q_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming,
       |       CAST(rn AS INT) AS rn
       |FROM ranked WHERE rn <= $k""".stripMargin

  /** DuckDB replay of [[mihRecall]] — brute popcount over the corpus
    * for the sampled probes, graded against the banded `within` set.
    */
  def mihRecallOracleSql(dim: Int = 64, radius: Int = 3,
                         nQueries: Int = 20): String = {
    val nWords = (dim + 31) / 32
    val hamExpr =
      s"""list_reduce(list_transform(range(0, $nWords), w ->
         |  CAST(bit_count(xor(qw[CAST(w + 1 AS INT)],
         |                     words[CAST(w + 1 AS INT)])) AS INT)),
         |  (a, b) -> a + b)""".stripMargin
    s"""WITH ${mihCtes(dim, radius)},
       |qsample AS (
       |  SELECT q_id, qw FROM qpacked ORDER BY q_id LIMIT $nQueries),
       |brute AS (
       |  SELECT q.q_id, p.vec_id
       |  FROM qsample q CROSS JOIN packed p
       |  WHERE $hamExpr <= $radius),
       |mset AS (
       |  SELECT w.q_id, w.neighbor_id AS vec_id
       |  FROM within w JOIN qsample USING (q_id)),
       |graded AS (
       |  SELECT b.q_id, COUNT(*) AS n_brute,
       |         SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
       |  FROM brute b LEFT JOIN mset m
       |    ON b.q_id = m.q_id AND b.vec_id = m.vec_id
       |  GROUP BY 1)
       |SELECT q_id, CAST(n_brute AS BIGINT) AS n_brute,
       |       CAST(n_hit AS BIGINT) AS n_hit,
       |       CAST(n_hit * 1000000 // n_brute AS BIGINT) AS recall_micro
       |FROM graded""".stripMargin
  }
}
