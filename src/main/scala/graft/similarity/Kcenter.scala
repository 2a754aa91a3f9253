package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez, "Clustering to minimize
  * the maximum intercluster distance", TCS 1985) — the farthest-point
  * traversal behind coreset curation of training corpora: pick the seed,
  * then k−1 times pick the point FARTHEST from everything selected so
  * far. The selected set 2-approximates the optimal k-center radius and,
  * unlike uniform sampling, is guaranteed to cover every outlying mode —
  * exactly what a data-curation pass wants when carving a small
  * maximally-diverse calibration/eval slice out of 100 TB.
  *
  * Scale shape: the selected set is MODEL STATE (k vectors on the
  * driver, k·dim doubles). Each round is ONE scan of the cached corpus —
  * the min-distance-to-selected is a `least(...)` over at most k−1
  * codegen'd fold expressions against literal centroid arrays, and the
  * argmax is `orderBy(md desc, vec_id).limit(1)`, which plans as a
  * TakeOrderedAndProject (per-partition top-1, #partitions rows to the
  * driver). k rounds = k scan-cost jobs; no corpus self-join, nothing
  * data-sized ever leaves the executors.
  *
  * Determinism (the cross-engine contract): distances are the exact
  * left-to-right IEEE fold over the 64 dims, rounded to 1e-6 BEFORE the
  * min/argmax (knife-edge ties resolve identically in both engines), and
  * every argmax tie-breaks ascending vec_id. The whole trajectory is a
  * deterministic function of the corpus, so the DuckDB oracle replays it
  * round by round (the kmeans/MMR unrolled-CTE pattern).
  */
object Kcenter {

  private def corpus(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def l2sqTo(vec: Array[Double]): Column =
    round(aggregate(zip_with(col("v"), array(vec.map(lit): _*),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, d) => acc + d), 6)

  /** The k-round farthest-point trajectory: (round, vec_id, dist_l2sq)
    * where `dist_l2sq` is the selection-time min distance to the prior
    * set (0.0 for the seed; the sequence is the non-increasing Gonzalez
    * radius curve). Seed = min vec_id.
    */
  def kcenterSelect(embeddings: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = graft.Caching.materialize(corpus(embeddings))
    val seedRow = e.orderBy(asc("vec_id")).limit(1)
      .select("vec_id", "v").head()
    var selected = Vector((seedRow.getLong(0), seedRow.getSeq[Double](1).toArray))
    var picks = Vector((1, seedRow.getLong(0), 0.0))
    var r = 2
    while (r <= k) {
      val dists = selected.map { case (_, sv) => l2sqTo(sv) }
      val md = if (dists.length == 1) dists.head else least(dists: _*)
      val ids = selected.map(_._1)
      val pick = e.filter(!col("vec_id").isInCollection(ids))
        .select(col("vec_id"), col("v"), md.as("md"))
        .orderBy(desc("md"), asc("vec_id")).limit(1)
        .head()
      selected :+= ((pick.getLong(0), pick.getSeq[Double](1).toArray))
      picks :+= ((r, pick.getLong(0), pick.getDouble(2)))
      r += 1
    }
    picks.toDF("round", "vec_id", "dist_l2sq")
  }

  /** DuckDB twin: the greedy loop unrolled as k−1 CTE rounds — each
    * round joins the corpus against the selected-so-far relation,
    * takes the per-point MIN of the 1e-6-rounded exact-fold distances,
    * and picks ROW_NUMBER()=1 by (md DESC, vec_id).
    */
  def kcenterOracleSql(k: Int = 8, dim: Int = 64): String = {
    // Every chained CTE is MATERIALIZED: sel$r is referenced 3× per
    // round (NOT IN + distance join + union) and DuckDB inlines
    // non-materialized CTEs, so the un-marked chain re-evaluated the
    // embeddings projection ~65× (measured 83 s at sf0.01 under the
    // 24 GB envelope — the q_ktruss-bomb shape, caught by the capped
    // dev/check_oracle.py sweep before it could hit the driver gate).
    val l2 = s"round(list_sum(list_transform(range(1, ${dim + 1}), " +
      "i -> (e.v[i]-s.v[i])*(e.v[i]-s.v[i]))), 6)"
    val rounds = (2 to k).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT e.vec_id, MIN($l2) AS md
         |  FROM e JOIN sel${r - 1} s ON TRUE
         |  WHERE e.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
         |  GROUP BY e.vec_id),
         |p$r AS MATERIALIZED (
         |  SELECT vec_id, md FROM (
         |    SELECT vec_id, md,
         |           ROW_NUMBER() OVER (ORDER BY md DESC, vec_id) AS rn
         |    FROM d$r) t WHERE rn = 1),
         |sel$r AS MATERIALIZED (
         |  SELECT * FROM sel${r - 1}
         |  UNION ALL
         |  SELECT e.vec_id, e.v FROM e JOIN p$r USING (vec_id))""".stripMargin
    }.mkString(",\n")
    val pickRows = (2 to k).map(r =>
      s"SELECT $r AS round, vec_id, md AS dist_l2sq FROM p$r").mkString("\nUNION ALL\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |sel1 AS MATERIALIZED (
       |  SELECT vec_id, v FROM e
       |  WHERE vec_id = (SELECT MIN(vec_id) FROM e)),
       |$rounds
       |SELECT CAST(round AS INTEGER) AS round, vec_id, dist_l2sq FROM (
       |  SELECT 1 AS round, vec_id, 0.0 AS dist_l2sq FROM sel1
       |  UNION ALL
       |  $pickRows) t""".stripMargin
  }
}
