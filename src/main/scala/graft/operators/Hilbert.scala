package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hilbert space-filling-curve ordering — the data-layout companion to
  * [[ZOrder]]: sorting a table by Hilbert value clusters
  * multi-dimensional range queries into contiguous file runs like
  * Z-order, but without Z-order's long diagonal jumps (every
  * consecutive pair of Hilbert cells is grid-adjacent), which measurably
  * tightens min/max file statistics for skinny range predicates
  * (Hilbert, "Über die stetige Abbildung einer Linie auf ein
  * Flächenstück", Math. Ann. 1891; curve arithmetic after the standard
  * iterative xy2d quadrant-rotation formulation).
  *
  * The per-row computation is a fixed unrolled chain of `bits` integer
  * CASE levels — one whole-stage-codegen projection, no join, no
  * shuffle, no UDF — generated from the same level template the DuckDB
  * oracle replays, so the value is bit-identical cross-engine. At each
  * level S = 2^i the quadrant index (3·rx XOR ry, spelled as a CASE so
  * no engine-specific XOR operator is needed) contributes S²·q to the
  * accumulator and the sub-square is rotated by the conditional
  * flip-and-swap; the flip complements against the FULL n−1 mask
  * (equivalent to the per-level mask on the bits that remain relevant,
  * and safe while high bits are still attached).
  *
  * Scale: a pure map over the table — layout ordering then happens via
  * repartitionByRange(hval) exactly as [[ZOrder]] documents; the 2×16-bit
  * domain gives a 32-bit curve value.
  */
object Hilbert {

  /** Per-level (acc', hx', hy') SQL expressions over current columns
    * (hx, hy, acc) at scale S — shared verbatim by the DataFrame chain
    * and the oracle CTE chain.
    */
  private def levelExprs(s: Long, nMinus1: Long): (String, String, String) = {
    val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
    // (3*rx) XOR ry for bits: 00→0, 01→1, 10→3, 11→2
    val q = s"(CASE WHEN $rx = 0 AND $ry = 0 THEN 0 WHEN $rx = 0 THEN 1 " +
      s"WHEN $ry = 0 THEN 3 ELSE 2 END)"
    // CAST the S² literal: int32·3 overflows at S = 2^15 in both engines
    val acc = s"acc + CAST(${s * s} AS BIGINT) * $q"
    val hx2 = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $nMinus1 - hy ELSE hy END) ELSE hx END)"
    val hy2 = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $nMinus1 - hx ELSE hx END) ELSE hy END)"
    (acc, hx2, hy2)
  }

  /** (idCol, hval): the Hilbert curve value of (xExpr, yExpr), each
    * masked into [0, 2^bits). `xExpr`/`yExpr` are SQL expressions so
    * callers can pass derived coordinates (e.g. `FLOOR(value)`).
    */
  def hilbertValue(df: DataFrame, idCol: String, xExpr: String, yExpr: String,
                   bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val n1 = (1L << bits) - 1
    var cur = df.select(col(idCol),
      expr(s"CAST($xExpr AS BIGINT) & $n1").as("hx"),
      expr(s"CAST($yExpr AS BIGINT) & $n1").as("hy"),
      lit(0L).as("acc"))
    for (i <- (bits - 1) to 0 by -1) {
      val (acc, hx2, hy2) = levelExprs(1L << i, n1)
      cur = cur.select(col(idCol),
        expr(hx2).as("hx"), expr(hy2).as("hy"), expr(acc).as("acc"))
    }
    cur.select(col(idCol), col("acc").as("hval"))
  }

  /** The l1..l`bits` level CTE blocks over a caller-provided `l0`
    * relation carrying (event_id, hx, hy, acc) — shared by
    * [[hilbertOracleSql]] and the layout-prune oracle.
    */
  def levelCtesSql(bits: Int): String = {
    val n1 = (1L << bits) - 1
    ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, k) =>
      val (acc, hx2, hy2) = levelExprs(1L << i, n1)
      s"""l${k + 1} AS (
         |  SELECT event_id, $hx2 AS hx, $hy2 AS hy, $acc AS acc FROM l$k)""".stripMargin
    }.mkString(",\n")
  }

  /** DuckDB replay over the events table (the q_hilbert wiring): the
    * identical level chain as nested CTEs.
    */
  def hilbertOracleSql(bits: Int = 16): String = {
    val n1 = (1L << bits) - 1
    s"""WITH l0 AS (
       |  SELECT event_id, (user_id & $n1) AS hx,
       |         (CAST(FLOOR(value) AS BIGINT) & $n1) AS hy,
       |         CAST(0 AS BIGINT) AS acc
       |  FROM events),
       |${levelCtesSql(bits)}
       |SELECT event_id, acc AS hval FROM l$bits""".stripMargin
  }
}
