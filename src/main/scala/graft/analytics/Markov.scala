package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stationary distribution of the event-type Markov chain — the
  * long-run occupancy the transition matrix (`q_transitions`,
  * [[Breadth3.eventTransitions]]) only implies: π = πP by synchronous
  * power iteration (von Mises & Pollaczek-Geiringer 1929; the
  * PageRank recurrence without teleport, on an empirically-stochastic
  * matrix). Product analysts read it as "where do user journeys
  * spend their time at equilibrium".
  *
  * Exactness (the [[PageRank]] discipline): π lives in 1e-12 integer
  * Mass units; each round moves mass by
  * contrib = (π(i)·n_ij) div n_i — the product lifted to
  * DECIMAL(38,0)/HUGEINT so a 10¹⁰-transition corpus cannot overflow —
  * and per-state sums are exact longs. Rounds are unrolled as oracle
  * CTEs with identical shapes, so the fixed point is bit-equal.
  *
  * Chain closure: states = types with at least one OUTGOING
  * transition; transitions INTO a type outside that set are dropped
  * and the row totals recomputed over the kept edges (the standard
  * sink-trimming; on product event streams every type both enters and
  * leaves, so the trim is a no-op guard). States that lose all
  * incoming mass leave the relation in both engines identically —
  * truncation drift of the `div` floor stays, as in PageRank, below
  * |E| units per round.
  *
  * Scale shape: ONE lead-window pass over events (user-partitioned —
  * never a global window) collapses the corpus to the bounded
  * (from_type, to_type, n) relation; every round is a keyed join +
  * hash agg on that type-domain relation, lazily chained (6 rounds,
  * bounded plan). The driver scalar is |states| — the type-domain
  * count, the kmeans-k precedent.
  */
object Markov {

  private val Mass = 1000000000000L

  /** π after `rounds` synchronous power-iteration rounds.
    * Output: (event_type, pi_e12, pi) — pi_e12 in 1e-12 units.
    */
  def stationaryEventTypes(events: DataFrame, rounds: Int = 6): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    // trim edges into sink types, recompute row totals over kept edges
    val states0 = pairs.select(col("from_type")).distinct()
    val trans0 = pairs.join(states0.select(col("from_type").as("to_type")),
      Seq("to_type"), "left_semi")
    val totals = graft.Caching.materialize(
      trans0.groupBy("from_type").agg(sum(col("n")).as("n_from")))
    val trans = graft.Caching.materialize(trans0.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from")))
    val nStates = totals.count() // bounded: the event-type domain
    var pi = totals.select(col("from_type").as("state"),
      lit(Mass / nStates).as("pi"))
    (1 to rounds).foreach { _ =>
      pi = trans.join(pi, trans("from_type") === pi("state"))
        .select(col("to_type"),
          expr("CAST((CAST(pi AS DECIMAL(38,0)) * n) div n_from AS BIGINT)")
            .as("contrib"))
        .groupBy(col("to_type").as("state"))
        .agg(sum(col("contrib")).as("pi"))
    }
    pi.select(col("state").as("event_type"), col("pi").as("pi_e12"),
      (col("pi").cast("double") / 1.0e12).as("pi"))
  }

  /** DuckDB replay of [[stationaryEventTypes]]: identical lead-window
    * pair counts, sink trim, and `rounds` unrolled HUGEINT `//` CTEs.
    */
  def stationaryOracleSql(rounds: Int = 6): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT t.to_type AS state,
         |         CAST(SUM(CAST((CAST(p.pi AS HUGEINT) * t.n) // t.n_from AS BIGINT))
         |              AS BIGINT) AS pi
         |  FROM p${r - 1} p JOIN trans t ON t.from_type = p.state
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT user_id, event_type,
       |         LEAD(event_type, 1) OVER (
       |           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
       |  FROM events),
       |pairs AS (
       |  SELECT event_type AS from_type, to_type, COUNT(*) AS n
       |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |states0 AS (SELECT DISTINCT from_type FROM pairs),
       |trans0 AS (
       |  SELECT p.from_type, p.to_type, p.n
       |  FROM pairs p WHERE EXISTS (
       |    SELECT 1 FROM states0 s WHERE s.from_type = p.to_type)),
       |totals AS (SELECT from_type, SUM(n) AS n_from FROM trans0 GROUP BY 1),
       |trans AS (
       |  SELECT t.from_type, t.to_type, t.n, tt.n_from
       |  FROM trans0 t JOIN totals tt ON tt.from_type = t.from_type),
       |p0 AS (
       |  SELECT from_type AS state,
       |         CAST(1000000000000 // (SELECT COUNT(*) FROM totals) AS BIGINT) AS pi
       |  FROM totals),
       |$roundCtes
       |SELECT state AS event_type, pi AS pi_e12,
       |       CAST(pi AS DOUBLE) / 1e12 AS pi
       |FROM p$rounds""".stripMargin
  }
}
