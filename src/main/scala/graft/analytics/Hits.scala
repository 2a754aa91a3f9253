package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg, "Authoritative sources in a
  * hyperlinked environment", JACM 1999) over the directed bipartite
  * customer→supplier purchase graph — the complement of [[PageRank]]:
  * PageRank measures global centrality on the symmetrized graph, HITS
  * splits the bipartite roles (customers as hubs that "endorse" many
  * good suppliers, suppliers as authorities endorsed by good hubs).
  *
  * Exact integer fixed-point, the repo's iterative-determinism
  * discipline (see [[PageRank]]): scores live in 1e-12 units, and each
  * half-round is
  *
  *   a(s)  = Σ_{c→s} h(c)                 (exact long sum)
  *   a'(s) = (a(s) · Mass) div Σ a        (L1 renormalize to Mass)
  *
  * and symmetrically for hubs. The renormalizing multiply runs in
  * DECIMAL(38,0) (a·Mass ≤ Σa·Mass ≈ deg·10²⁴ ≪ 10³⁸) and `div`
  * truncates — every intermediate is exact, so the result is
  * bit-identical under any partitioning and in the DuckDB replay
  * ([[hitsOracleSql]] unrolls the same rounds with HUGEINT `//`).
  * Float HITS would drift by summation order; L2 normalization would
  * need a square root — L1 keeps the fixed point integral, and scores
  * are only meaningful up to scale anyway.
  *
  * Scale shape: per round, two (edge ⋈ score) hash joins and two sums —
  * the PageRank shape run once per direction. Score state is 16 B/node;
  * the per-round L1 total is one scalar aggregate (bounded driver
  * state, the kmeans-centroid pattern). The edge relation is persisted
  * across all rounds.
  */
object Hits {

  private val Mass = 1000000000000L // 1e12 score units

  /** Hub/authority scores after `rounds` full HITS rounds.
    * Output: (id, node_type, score_units, score) — customers carry hub
    * scores, suppliers authority scores (the bipartite graph has no
    * mixed roles).
    */
  def hits(lineitem: DataFrame, orders: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "need at least one round")
    // directed distinct customer→supplier edges; parity node ids as in
    // PageRank (collision-free at any key scale). Feeds both per-round
    // joins — materialized so the lineitem⋈orders distinct runs once.
    val edges = graft.Caching.materialize(
      lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(PageRank.customerNode(col("o_custkey")).as("src"),
          PageRank.supplierNode(col("l_suppkey")).as("dst"))
        .distinct())
    // renormalize to Mass with the L1 total as a broadcast 1-row
    // aggregate, NOT a driver .head() — per-round scalar actions double
    // the job count, and on local[32] each job carries ~0.5 s of fixed
    // driver latency. The raw agg feeds both the total and the rescale;
    // the identical subtree shares one exchange (ReuseExchange).
    // IntegralDivide (`div`) accepts decimal operands and returns
    // BIGINT, matching the oracle's HUGEINT `//` on non-negatives.
    def renorm(scores: DataFrame, idCol: String): DataFrame = {
      val tot = scores.agg(coalesce(sum(col("s")), lit(0L)).as("tot"))
      scores.crossJoin(broadcast(tot))
        .select(col(idCol),
          expr(s"CAST((CAST(s AS DECIMAL(38,0)) * $Mass) div tot AS BIGINT)").as("s"))
    }
    val nHubs = edges.select("src").distinct().count()
    var hubs = edges.select(col("src")).distinct()
      .select(col("src"), lit(Mass / nHubs).as("s"))
    var auths: DataFrame = null
    // ONE action per round: auths stays lazy inside the round (single
    // consumer — the hub update), and the round's hub relation is
    // checkpointed (feeds the next round twice; see Caching.checkpointed)
    for (_ <- 1 to rounds) {
      auths = renorm(
        edges.join(hubs, "src")
          .groupBy(col("dst")).agg(sum(col("s")).as("s")), "dst")
      hubs = graft.Caching.checkpointed(renorm(
        edges.join(auths.withColumnRenamed("dst", "d2"),
            edges("dst") === col("d2"))
          .groupBy(col("src")).agg(sum(col("s")).as("s")), "src"))
    }
    hubs.select(col("src").as("id"), lit("hub").as("node_type"), col("s"))
      .unionByName(
        auths.select(col("dst").as("id"), lit("authority").as("node_type"), col("s")))
      .select(col("id"), col("node_type"), col("s").as("score_units"),
        (col("s").cast("double") / Mass).as("score"))
  }

  /** DuckDB replay of [[hits]]: same integer recurrence, rounds unrolled
    * as CTE pairs, renormalization via HUGEINT `//` (agrees with `div`
    * on non-negative values).
    */
  def hitsOracleSql(rounds: Int = 3): String = {
    val roundsSql = (1 to rounds).map { k =>
      s"""a${k}_raw AS (
         |  SELECT e.dst, SUM(h.s) AS s FROM edges e
         |  JOIN h${k - 1} h ON h.src = e.src GROUP BY 1),
         |a$k AS (
         |  SELECT dst, CAST(CAST(s AS HUGEINT) * 1000000000000 //
         |    (SELECT SUM(s) FROM a${k}_raw) AS BIGINT) AS s FROM a${k}_raw),
         |h${k}_raw AS (
         |  SELECT e.src, SUM(a.s) AS s FROM edges e
         |  JOIN a$k a ON a.dst = e.dst GROUP BY 1),
         |h$k AS (
         |  SELECT src, CAST(CAST(s AS HUGEINT) * 1000000000000 //
         |    (SELECT SUM(s) FROM h${k}_raw) AS BIGINT) AS s FROM h${k}_raw)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |h0 AS (
       |  SELECT src, 1000000000000 // (SELECT COUNT(DISTINCT src) FROM edges) AS s
       |  FROM (SELECT DISTINCT src FROM edges)),
       |$roundsSql
       |SELECT id, node_type, score_units,
       |       CAST(score_units AS DOUBLE) / 1000000000000.0 AS score
       |FROM (
       |  SELECT src AS id, 'hub' AS node_type, s AS score_units FROM h$rounds
       |  UNION ALL
       |  SELECT dst, 'authority', s FROM a$rounds)""".stripMargin
  }
}
