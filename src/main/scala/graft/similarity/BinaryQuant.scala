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
  * `transform`/`aggregate` over the vector, no UDF); the query side is
  * a FIXED small set (nQueries rows) so the candidate join is a
  * broadcast nested-loop — cost linear in corpus size, the brute-force
  * baseline shape of [[Ann]]. At 100 TB the packed corpus is the
  * asset: 16 B/vector instead of 256 B, so the same scan ranks 16×
  * more vectors per byte read; bucketing the packed words (multi-index
  * Hamming, Norouzi CVPR'12) is the documented next rung if nQueries
  * grows data-sized.
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
}
