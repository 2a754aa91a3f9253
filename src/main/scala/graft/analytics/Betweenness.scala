package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Landmark-sampled betweenness centrality — Brandes' dependency
  * accumulation (Brandes, J. Math. Sociol. 25:163, 2001) run from a
  * fixed landmark set instead of every vertex (the standard unbiased
  * estimator of Bader et al., ALENEX'07 / Riondato & Kornaropoulos,
  * WSDM'14 up to the sampling rule; landmarks here are the same
  * fully-ordered top-degree hubs every other graph operator seeds
  * from), with BFS depth bounded at `rounds`.
  *
  * Per landmark s: a forward BFS counts shortest paths σ(s,v) (exact
  * BIGINT sums over predecessor frontiers — set-valued, no
  * tie-breaks), then the backward pass folds dependencies level by
  * level: δ(v) = Σ_{w ∈ succ(v)} σ(v)/σ(w) · (1 + δ(w)). The division
  * is data-dependent, so δ is held in nano units with ONE integer
  * division per (v,w) term — `σ(v)·(10⁹ + δ_nano(w)) div σ(w)`, all
  * values nonnegative (truncate == floor, no cross-engine division
  * split), products lifted to DECIMAL(38,0)/HUGEINT before the div.
  * The per-level evaluation order is pinned by the algorithm itself,
  * so the oracle replays bit-for-bit by unrolling the same levels.
  *
  * Output: (node, bc_nano) — Σ over landmarks of δ(v), v ∉ landmarks'
  * own rows with δ = 0 dropped. On an undirected graph full Brandes
  * counts each unordered pair from both endpoints; the landmark
  * estimator inherits whatever subset the landmarks see — documented
  * estimator semantics, same contract as [[Harmonic]].
  *
  * 100 TB shape: forward is the [[Harmonic]] multi-landmark frontier
  * pattern — (s, node, dist, σ) state ≤ k·|V| rows, per-round work
  * Σ frontier-degree with one anti-join against the visited set (the
  * σ-correctness requirement that also caps state); backward is one
  * (s, node)-keyed hash join per level between adjacent level slices.
  * Level relations are checkpoint-materialized once and reused by both
  * passes.
  */
object Betweenness {

  /** (node, bc_nano) for nodes with positive dependency from the
    * top-`nLandmarks` degree hubs within `rounds` hops.
    */
  def landmarkBetweenness(edges: DataFrame, srcCol: String, dstCol: String,
                          nLandmarks: Int = 5, rounds: Int = 3,
                          canonical: Boolean = false,
                          symmetric: Boolean = false): DataFrame = {
    require(nLandmarks >= 1 && rounds >= 2, "need landmarks and rounds >= 2")
    val e = GraphEdges.symmetricDistinct(edges, srcCol, dstCol, canonical,
      symmetric)
    val seeds = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("node").asc)
      .limit(nLandmarks)
      .select(col("node").as("s"), col("node"), lit(1L).as("sigma"))
    // forward: per-level (s, node, sigma) slices, each checkpointed —
    // both the next round's anti-join and the backward pass reuse them
    var levels = Vector(graft.Caching.checkpointed(seeds))
    var visited = levels.head.select(col("s"), col("node"))
    for (r <- 1 to rounds) {
      val frontier = levels.last.select(col("s"), col("node").as("src"),
        col("sigma"))
      val next = graft.Caching.checkpointed(
        e.join(frontier, "src")
          .select(col("s"), col("dst").as("node"), col("sigma"))
          .join(visited, Seq("s", "node"), "left_anti")
          .groupBy("s", "node").agg(sum("sigma").as("sigma")))
      levels = levels :+ next
      visited = visited.unionByName(next.select(col("s"), col("node")))
    }
    // backward: δ over levels rounds-1 .. 1; the deepest level has δ = 0.
    // δ_nano sums stay in BIGINT — headroom bound ~ 10⁹ · (paths through
    // the node from one landmark), i.e. ~10⁹ σ-mass; past ~10⁹ paths
    // lift `delta` to DECIMAL(38,0) like the per-term product already is
    var deltaAbove = levels(rounds)
      .select(col("s"), col("node"), col("sigma"), lit(0L).as("delta"))
    var acc: DataFrame = null
    for (l <- (rounds - 1) to 1 by -1) {
      val succ = deltaAbove.select(col("s").as("ws"), col("node").as("wdst"),
        col("sigma").as("sigma_w"), col("delta").as("delta_w"))
      val deltaCur = graft.Caching.checkpointed(
        levels(l)
          .join(e, col("node") === col("src"), "left_outer")
          .join(succ,
            col("ws") === col("s") && col("wdst") === col("dst"), "left_outer")
          .select(col("s"), col("node"), col("sigma"),
            coalesce(
              expr("cast(sigma as decimal(38,0)) * " +
                "(1000000000 + delta_w) div sigma_w"),
              lit(0L)).as("term"))
          .groupBy("s", "node")
          .agg(first("sigma").as("sigma"), sum("term").as("delta")))
      acc = if (acc == null) deltaCur.select(col("node"), col("delta"))
            else acc.unionByName(deltaCur.select(col("node"), col("delta")))
      deltaAbove = deltaCur
    }
    acc.groupBy("node")
      .agg(sum("delta").as("bc_nano"))
      .filter(col("bc_nano") > 0)
  }

  /** DuckDB replay over the co-bought-parts graph: forward levels as
    * anti-joined CTE rounds carrying σ sums, backward dependency levels
    * as LEFT-JOIN folds of the SAME per-edge integer-division terms.
    */
  def landmarkBetweennessOracleSql(nLandmarks: Int = 5, rounds: Int = 3): String = {
    val fwd = (1 to rounds).map { r =>
      val visited = (0 until r).map(i => s"SELECT s, node FROM l$i")
        .mkString(" UNION ALL ")
      s"""l$r AS (
         |  SELECT c.s, c.node, CAST(SUM(c.sigma) AS BIGINT) AS sigma FROM (
         |    SELECT f.s, e.dst AS node, f.sigma
         |    FROM e JOIN l${r - 1} f ON f.node = e.src) c
         |  ANTI JOIN ($visited) v ON v.s = c.s AND v.node = c.node
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val bwd = ((rounds - 1) to 1 by -1).map { l =>
      val above = if (l == rounds - 1) s"(SELECT s, node, sigma, 0 AS delta FROM l$rounds)"
                  else s"d${l + 1}"
      s"""d$l AS (
         |  SELECT c.s, c.node, c.sigma,
         |         CAST(COALESCE(SUM(CAST(c.sigma AS HUGEINT) *
         |           (1000000000 + w.delta) // w.sigma), 0) AS BIGINT) AS delta
         |  FROM l$l c
         |  LEFT JOIN e ON e.src = c.node
         |  LEFT JOIN $above w ON w.s = c.s AND w.node = e.dst
         |  GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    val unionDeltas = (1 to (rounds - 1))
      .map(l => s"SELECT node, delta FROM d$l").mkString(" UNION ALL ")
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |eh AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM items a JOIN items b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |e AS (SELECT u AS src, v AS dst FROM eh UNION SELECT v, u FROM eh),
       |deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1),
       |l0 AS (
       |  SELECT node AS s, node, CAST(1 AS BIGINT) AS sigma FROM (
       |    SELECT node, ROW_NUMBER() OVER (ORDER BY d DESC, node) AS rn
       |    FROM deg) t
       |  WHERE rn <= $nLandmarks),
       |$fwd,
       |$bwd
       |SELECT node, CAST(SUM(delta) AS BIGINT) AS bc_nano
       |FROM ($unionDeltas)
       |GROUP BY 1 HAVING SUM(delta) > 0""".stripMargin
  }
}
