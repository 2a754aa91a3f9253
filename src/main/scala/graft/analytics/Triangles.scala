package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with degree orientation (Suri &
  * Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
  * WWW'11) — the graph statistic behind clustering-coefficient / community
  * quality signals.
  *
  * Every undirected edge is oriented from its (degree, id)-SMALLER
  * endpoint to the larger; each triangle then has exactly one node with
  * out-edges to the other two, so
  *
  *   triangles = |{(u,v,w) : u→v, u→w, v≺w, v→w}|
  *
  * counted by one wedge self-join at the low node plus one closing-edge
  * join. The orientation is the scale insight: out-degree under it is
  * bounded by O(√m) on any graph (arboricity), so Σ outdeg² — the wedge
  * join's output — cannot melt down on power-law hubs the way a naive
  * id-ordering can (a celebrity node of degree 10⁷ would otherwise emit
  * 10¹⁴ wedges from one reducer; degree-ordered it emits none). The
  * DuckDB oracle counts the SAME triangles under plain id-ordering — a
  * different orientation and join shape, so the match is a real
  * differential proof, not a replay.
  */
object Triangles {

  /** Global triangle count over an undirected edge relation given as
    * (u, v) pairs with u ≠ v, each undirected edge present once (either
    * direction). Output: one row (n_triangles).
    */
  def triangleCount(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = edges.select(col(uCol).cast("long").as("u"), col(vCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient by (degree, id): src = smaller endpoint under ≺
    val withDegs = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val oriented = withDegs.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("id"), col("du").as("d")))
        .otherwise(struct(col("v").as("id"), col("dv").as("d"))).as("s"),
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("v").as("id"), col("dv").as("d")))
        .otherwise(struct(col("u").as("id"), col("du").as("d"))).as("t"))
      .select(col("s.id").as("src"),
        col("t.id").as("dst"), col("t.d").as("dst_d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges at the low node: two out-edges, second dst ≺-greater
    val closing = oriented.select(col("src").as("w_v"), col("dst").as("w_w"))
    val triangles = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (struct(col("e1.dst_d"), col("e1.dst")) <
            struct(col("e2.dst_d"), col("e2.dst"))))
      .select(col("e1.dst").as("w_v"), col("e2.dst").as("w_w"))
      .join(closing, Seq("w_v", "w_w"), "left_semi")
    triangles.agg(count(lit(1)).as("n_triangles"))
  }
}
