package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager cache materialization.
  *
  * `persist()` alone only marks the relation: if the FIRST action's plan
  * consumes it from multiple independent stages, Spark schedules those
  * stages concurrently and each recomputes the full upstream — the cache
  * dedups work only once it is populated. Serializing one cheap pass
  * (`count()`) before the consumers turns N upstream recomputes into 1
  * compute + N cache reads (measured on `Triangles.triangleCount` at
  * sf0.1: 7.4 s black-box vs 1.6 s with materialized intermediates —
  * same plan, same persists).
  *
  * Use for relations that (a) are expensive to build and (b) feed 2+
  * DIFFERENT plan subtrees of the same downstream action (e.g. a degree
  * aggregation AND a join, or two joins with different projections).
  * Single-consumer persists gain nothing and pay an extra pass — and so
  * do plain self-joins of one projection: there the two map stages are
  * identical and Spark's ReuseExchange already computes them once
  * (measured on minhashDedup's band self-join: materializing was ~0.6s
  * SLOWER at sf0.1 than the bare persist).
  */
object Caching {
  def materialize(df: DataFrame,
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val cached = df.persist(level)
    cached.count()
    cached
  }
}
