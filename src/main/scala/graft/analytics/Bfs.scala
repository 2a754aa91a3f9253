package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search: minimum hop distance from a seed
  * set, the primitive behind "how far is every product from the hubs"
  * reachability/influence questions (and the building block of
  * HyperANF-style diameter estimates). Bounded-round frontier expansion
  * with a min-distance merge — the standard Pregel message pattern
  * expressed as joins, after Malewicz et al., "Pregel: A System for
  * Large-Scale Graph Processing" (SIGMOD'10).
  *
  * Determinism: BFS layers are set-valued — no tie-breaks exist to get
  * wrong; a node's distance is the round it first appears, so fixed
  * rounds replay exactly as unrolled CTEs in the oracle.
  *
  * 100 TB shape: each round joins the EDGE relation against only the
  * newest FRONTIER (dist == round−1), not the full visited set — work
  * per round is Σ frontier-degree, the textbook BFS bound. The visited
  * relation stays (node, dist) = 12 B/node; the merge is a hash agg.
  * Unreached nodes are simply absent (no sentinel ∞ rows to carry).
  */
object Bfs {

  /** Hop distance from the top-`nSeeds` highest-degree hubs (degree
    * desc, node asc — fully ordered) within `rounds` hops.
    * Output: (node, dist), one row per reached node.
    */
  def hubDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   nSeeds: Int = 10, rounds: Int = 3,
                   canonical: Boolean = false,
                   symmetric: Boolean = false): DataFrame = {
    require(nSeeds >= 1 && rounds >= 1, "need seeds and at least one round")
    // symmetric distinct edge relation, built via the half-edge-cached
    // union so the upstream pipeline runs once, not once per branch
    // (canonical = true skips the symmetrization distinct; symmetric =
    // true consumes the shared pre-built relation — GraphEdges)
    val e = GraphEdges.symmetricDistinct(edges, srcCol, dstCol, canonical,
      symmetric)
    val seeds = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("node").asc)
      .limit(nSeeds)
      .select(col("node"), lit(0).as("dist"))
    // checkpoint each round BEFORE releasing the previous one: `dist`
    // feeds TWO subtrees per round (frontier filter + union) — left
    // lazy, the chain recomputes ~2^rounds times; left merely
    // persisted, the rendered plan-description doubles per round and
    // the driver stalls between jobs (Caching.checkpointed)
    var dist = graft.Caching.checkpointed(seeds)
    for (r <- 1 to rounds) {
      val next = graft.Caching.checkpointed(bfsRound(e, dist, r))
      // RDD-level release: Dataset.unpersist() would be a no-op on a
      // localCheckpointed frame (Caching.releaseCheckpoint)
      graft.Caching.releaseCheckpoint(dist)
      dist = next
    }
    dist
  }

  /** One BFS frontier round BODY: only the NEWEST frontier (dist = r−1)
    * joins the edge relation — per-round work is Σ frontier-degree, not
    * Σ visited-degree — then one min-agg merges the expansion into the
    * visited set. Factored out (round-10 verdict #3) so PlanSnapshotSpec
    * pins the INNER-LOOP plan shape the per-round checkpoint hides.
    */
  private[graft] def bfsRound(e: DataFrame, dist: DataFrame, r: Int): DataFrame = {
    val frontier = dist.filter(col("dist") === r - 1)
      .select(col("node").as("src"))
    val expanded = e.join(frontier, "src")
      .select(col("dst").as("node"), lit(r).as("dist"))
    dist.unionByName(expanded)
      .groupBy("node").agg(min("dist").as("dist"))
  }

  /** DuckDB replay over the co-bought-parts graph: same degree-ordered
    * seed selection, each frontier round unrolled as a CTE pair.
    */
  def hubDistancesOracleSql(nSeeds: Int = 10, rounds: Int = 3): String = {
    val roundsSql = (1 to rounds).map { r =>
      s"""f$r AS (
         |  SELECT e.dst AS node, $r AS dist
         |  FROM e JOIN (SELECT node FROM d${r - 1} WHERE dist = ${r - 1}) fr
         |    ON fr.node = e.src),
         |d$r AS (
         |  SELECT node, MIN(dist) AS dist FROM
         |  (SELECT * FROM d${r - 1} UNION ALL SELECT * FROM f$r) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |eh AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM items a JOIN items b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |e AS (SELECT u AS src, v AS dst FROM eh UNION SELECT v, u FROM eh),
       |deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1),
       |d0 AS (
       |  SELECT node, 0 AS dist FROM (
       |    SELECT node, ROW_NUMBER() OVER (ORDER BY d DESC, node) AS rn
       |    FROM deg) t
       |  WHERE rn <= $nSeeds),
       |$roundsSql
       |SELECT node, dist FROM d$rounds""".stripMargin
  }
}
