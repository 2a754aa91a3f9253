package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Landmark-based harmonic centrality (Boldi & Vigna, "Axioms for
  * Centrality", Internet Math. 10:222, 2014): harmonic centrality
  * H(v) = Σ_u 1/d(u,v) is the textbook closeness variant that handles
  * disconnected graphs, but exact computation needs all-pairs
  * distances — at corpus scale everyone estimates it from a fixed
  * landmark set instead (the HyperANF/landmark-BFS tradition). This
  * operator runs one bounded-round multi-source BFS PER LANDMARK —
  * state is (landmark, node, dist), so the k landmark searches share
  * every join and shuffle rather than looping k times — and reports,
  * per reached node, how many landmarks reached it and the harmonic sum
  * Σ 10^6 div dist over them (exact integer division, dist ≥ 1; self
  * rows are excluded).
  *
  * Determinism: BFS layers are set-valued — no tie-breaks; the landmark
  * choice is the same fully-ordered top-degree rule as [[Bfs]]
  * (degree desc, node asc).
  *
  * 100 TB shape: identical to [[Bfs.hubDistances]] with a k× state
  * multiplier — each round joins edges against only the newest frontier
  * (dist == round−1) keyed by node, carrying the landmark id as
  * payload; the merge is a hash agg on (landmark, node). Work per round
  * is Σ frontier-degree summed over landmarks, state is ≤ k·|V| rows of
  * 20 B. Rounds are checkpoint-truncated like every iterative operator
  * here.
  */
object Harmonic {

  /** (node, n_reached, harmonic_micro) for every node within `rounds`
    * hops of at least one of the top-`nLandmarks` degree hubs.
    */
  def landmarkHarmonic(edges: DataFrame, srcCol: String, dstCol: String,
                       nLandmarks: Int = 5, rounds: Int = 3,
                       canonical: Boolean = false,
                       symmetric: Boolean = false): DataFrame = {
    require(nLandmarks >= 1 && rounds >= 1, "need landmarks and rounds")
    val e = GraphEdges.symmetricDistinct(edges, srcCol, dstCol, canonical,
      symmetric)
    val landmarks = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("node").asc)
      .limit(nLandmarks)
      .select(col("node").as("lm"), col("node"), lit(0).as("dist"))
    var dist = graft.Caching.checkpointed(landmarks)
    for (r <- 1 to rounds) {
      val frontier = dist.filter(col("dist") === r - 1)
        .select(col("lm"), col("node").as("src"))
      val expanded = e.join(frontier, "src")
        .select(col("lm"), col("dst").as("node"), lit(r).as("dist"))
      val next = graft.Caching.checkpointed(dist.unionByName(expanded)
        .groupBy("lm", "node").agg(min("dist").as("dist")))
      graft.Caching.releaseCheckpoint(dist)
      dist = next
    }
    dist.filter(col("dist") >= 1)
      .groupBy("node")
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("cast(1000000 as bigint) div dist")).as("harmonic_micro"))
  }

  /** DuckDB replay over the co-bought-parts graph: the [[Bfs]] oracle's
    * degree-ordered seed rule, each frontier round unrolled as a CTE
    * pair carrying the landmark column.
    */
  def landmarkHarmonicOracleSql(nLandmarks: Int = 5, rounds: Int = 3): String = {
    val roundsSql = (1 to rounds).map { r =>
      s"""f$r AS (
         |  SELECT fr.lm, e.dst AS node, $r AS dist
         |  FROM e JOIN (SELECT lm, node FROM d${r - 1} WHERE dist = ${r - 1}) fr
         |    ON fr.node = e.src),
         |d$r AS (
         |  SELECT lm, node, MIN(dist) AS dist FROM
         |  (SELECT * FROM d${r - 1} UNION ALL SELECT * FROM f$r)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |eh AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM items a JOIN items b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |e AS (SELECT u AS src, v AS dst FROM eh UNION SELECT v, u FROM eh),
       |deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1),
       |d0 AS (
       |  SELECT node AS lm, node, 0 AS dist FROM (
       |    SELECT node, ROW_NUMBER() OVER (ORDER BY d DESC, node) AS rn
       |    FROM deg) t
       |  WHERE rn <= $nLandmarks),
       |$roundsSql
       |SELECT node, COUNT(*) AS n_reached,
       |       CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_micro
       |FROM d$rounds WHERE dist >= 1
       |GROUP BY 1""".stripMargin
  }
}
