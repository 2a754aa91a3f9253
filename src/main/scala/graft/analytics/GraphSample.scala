package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph training-data sampling: the two standard ways a corpus pipeline
  * turns a graph into model inputs —
  *
  *   - DeepWalk-style random-walk corpora (Perozzi, Al-Rfou & Skiena,
  *     KDD 2014): truncated random walks whose node sequences feed a
  *     skip-gram embedding trainer exactly like sentences feed word2vec;
  *   - GraphSAGE-style bounded neighbor fanouts (Hamilton, Ying &
  *     Leskovec, NeurIPS 2017): a fixed k₁×k₂ two-hop sample per root
  *     node, the minibatch shape GNN trainers consume.
  *
  * Both are DETERMINISTIC here: every "random" choice is an md5-derived
  * integer (the repo-wide cross-engine convention — DuckDB computes the
  * identical digest), so the emitted corpus is reproducible bit-for-bit
  * and the DuckDB oracle replays it exactly. Production pipelines want
  * exactly this property (reshuffling a walk corpus between runs breaks
  * caching and eval comparability); a seeded hash IS the standard way to
  * get it (linear congruential choices keyed on (walk, step)).
  *
  * Scale: everything is equi-joins and per-node windows.
  *   - The neighbor index (`row_number` per source node) partitions by
  *     node — bounded by max degree, the same bound every adjacency
  *     build in this repo carries; hubs are capped upstream by the
  *     basket explode guard.
  *   - Each walk step is TWO hash equi-joins (frontier⋈degree to draw
  *     the neighbor index, then frontier⋈adjacency on (node, index)) —
  *     no wedge blowup, the frontier never grows: exactly one row per
  *     walk per step.
  *   - The fanout sample is two windowed top-k filters and two
  *     equi-joins; output is |roots|·k₁·k₂ rows by construction.
  */
object GraphSample {

  /** 60-bit md5 digest of a string column — replayed by DuckDB as
    * `('0x' || substring(md5(x),1,15))::BIGINT` (same convention as
    * [[graft.dedup.Dedup.md5Base60]], kept private there).
    */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Canonical half-edge relation → symmetric (src, dst) pairs. */
  private def symmetric(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val half = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    half.union(half.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Truncated deterministic random walks: one walk of `walkLen` steps
    * from every start node whose seeded digest lands in the
    * `1/startMod` sample (keeps the corpus a tunable fraction of |V|).
    * Output: (walk_id, step, node) — walk_id is the start node, step 0
    * is the start itself. Walks never die: every node in the symmetric
    * relation has degree ≥ 1 by construction.
    *
    * The neighbor drawn at step t of walk w is
    * `adj[node][1 + h60("seed:w:t") mod deg(node)]` where `adj` orders
    * each node's neighbors by id — both engines derive the identical
    * index, so the corpora match row-for-row.
    */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
                  walkLen: Int = 4, startMod: Int = 7,
                  seed: String = "walk"): DataFrame = {
    require(walkLen >= 1 && startMod >= 1, "walkLen and startMod must be >= 1")
    val sym = symmetric(edges, srcCol, dstCol)
    // NOT materialized: the per-step adjacency/degree subtrees are
    // identical map stages, so ReuseExchange computes each exchange once
    // (an eager cache was measured 2x SLOWER at sf0.1 — two blocking
    // passes bought nothing; see the Caching scaladoc's self-join rule)
    val adjIdx = sym.select(col("src"), col("dst"),
      row_number().over(Window.partitionBy("src").orderBy("dst")).as("idx"))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val starts = deg.select(col("src").as("walk_id"))
      .filter(pmod(h60(concat(lit(s"$seed:start:"), col("src").cast("string"))),
        lit(startMod.toLong)) === 0)

    var frontier = starts.select(col("walk_id"), col("walk_id").as("node"))
    var out = frontier.select(col("walk_id"), lit(0).as("step"), col("node"))
    for (t <- 1 to walkLen) {
      val draw = frontier
        .join(deg, frontier("node") === deg("src"))
        .select(col("walk_id"),
          col("node").as("cur"),
          (pmod(h60(concat(lit(s"$seed:"), col("walk_id").cast("string"),
            lit(s":$t"))), col("deg")) + 1).as("nxt_idx"))
      val next = draw
        .join(adjIdx, draw("cur") === adjIdx("src") &&
          draw("nxt_idx") === adjIdx("idx"))
        .select(col("walk_id"), col("dst").as("node"))
      out = out.union(next.select(col("walk_id"), lit(t).as("step"), col("node")))
      frontier = next
    }
    out
  }

  /** DuckDB twin of [[randomWalks]] over the co-bought-parts graph —
    * the walk rounds unrolled as CTEs, each drawing the same md5 index.
    */
  def randomWalksOracleSql(walkLen: Int = 4, startMod: Int = 7,
                           seed: String = "walk"): String = {
    val steps = (1 to walkLen).map { t =>
      val prev = if (t == 1) "w0" else s"w${t - 1}"
      s"""w$t AS (
         |  SELECT w.walk_id, a.dst AS node
         |  FROM $prev w
         |  JOIN deg d ON d.src = w.node
         |  JOIN adj a ON a.src = w.node
         |   AND a.idx = 1 + (('0x' || substring(md5('$seed:' || CAST(w.walk_id AS VARCHAR) || ':$t'), 1, 15))::BIGINT % d.deg))"""
        .stripMargin
    }.mkString(",\n")
    val union = (0 to walkLen).map(t =>
      s"SELECT walk_id, CAST($t AS INTEGER) AS step, node FROM w$t").mkString("\nUNION ALL\n")
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM items a JOIN items b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |sym AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM e
       |        UNION ALL
       |        SELECT CAST(dst AS BIGINT), CAST(src AS BIGINT) FROM e),
       |deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY 1),
       |adj AS (SELECT src, dst,
       |               ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS idx
       |        FROM sym),
       |w0 AS (
       |  SELECT src AS walk_id, src AS node FROM deg
       |  WHERE ('0x' || substring(md5('$seed:start:' || CAST(src AS VARCHAR)), 1, 15))::BIGINT % $startMod = 0),
       |$steps
       |$union""".stripMargin
  }

  /** GraphSAGE-style deterministic two-hop neighbor fanout: for every
    * root in the `1/startMod` seeded sample, its top-`k1` neighbors in
    * md5-tape order, and each of THEIR top-`k2` neighbors — one row per
    * sampled (root, hop-1, hop-2) path with both sample ranks. The
    * md5-of-(src,dst) tape makes the per-node sample a fixed uniform
    * draw that both engines replay; the rank columns let a trainer
    * reconstruct the fanout tensor shape without re-sorting.
    *
    * Backtracking paths (n2 = root) are kept, as in the reference
    * algorithm — GNN aggregation handles them; dropping them would bias
    * degree-1 hop-1 nodes to emit nothing.
    */
  def neighborSample(edges: DataFrame, srcCol: String, dstCol: String,
                     k1: Int = 3, k2: Int = 2, startMod: Int = 7,
                     seed: String = "sage"): DataFrame = {
    require(k1 >= 1 && k2 >= 1 && startMod >= 1, "k1, k2, startMod must be >= 1")
    val sym = symmetric(edges, srcCol, dstCol)
    // md5 tape order with an id tie-break (md5 ties are vanishingly rare
    // but the total order must be unconditional for cross-engine parity)
    val tape = md5(concat(lit(s"$seed:"), col("src").cast("string"),
      lit(":"), col("dst").cast("string")))
    val ranked = sym.select(col("src"), col("dst"),
      row_number().over(Window.partitionBy("src").orderBy(tape, col("dst"))).as("r"))
    val roots = sym.select(col("src")).distinct()
      .filter(pmod(h60(concat(lit(s"$seed:root:"), col("src").cast("string"))),
        lit(startMod.toLong)) === 0)
      .select(col("src").as("root"))
    val hop1 = ranked.filter(col("r") <= k1)
      .select(col("src").as("root"), col("dst").as("n1"), col("r").as("r1"))
    val hop2 = ranked.filter(col("r") <= k2)
      .select(col("src").as("n1"), col("dst").as("n2"), col("r").as("r2"))
    roots.join(hop1, "root").join(hop2, "n1")
      .select(col("root"), col("n1"), col("n2"), col("r1"), col("r2"))
  }

  /** DuckDB twin of [[neighborSample]] over the co-bought-parts graph. */
  def neighborSampleOracleSql(k1: Int = 3, k2: Int = 2, startMod: Int = 7,
                              seed: String = "sage"): String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM items a JOIN items b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |sym AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM e
       |        UNION ALL
       |        SELECT CAST(dst AS BIGINT), CAST(src AS BIGINT) FROM e),
       |ranked AS (
       |  SELECT src, dst,
       |         ROW_NUMBER() OVER (PARTITION BY src
       |           ORDER BY md5('$seed:' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), dst) AS r
       |  FROM sym),
       |roots AS (
       |  SELECT DISTINCT src AS root FROM sym
       |  WHERE ('0x' || substring(md5('$seed:root:' || CAST(src AS VARCHAR)), 1, 15))::BIGINT % $startMod = 0)
       |SELECT t.root, h1.dst AS n1, h2.dst AS n2,
       |       CAST(h1.r AS INTEGER) AS r1, CAST(h2.r AS INTEGER) AS r2
       |FROM roots t
       |JOIN ranked h1 ON h1.src = t.root AND h1.r <= $k1
       |JOIN ranked h2 ON h2.src = h1.dst AND h2.r <= $k2""".stripMargin
}
