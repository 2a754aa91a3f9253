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

  /** Eager localCheckpoint: materializes AND truncates lineage — the
    * round-loop variant of [[materialize]] for iterative operators
    * (k-core, LPA, BFS, HITS; same pattern as the star-contraction CC).
    *
    * Why persist alone is not enough there: a persisted round output
    * keeps its full LOGICAL plan, and Spark eagerly renders the plan
    * description string on every action and AQE update
    * (SQLExecution.withNewExecutionId / onUpdatePlan — even with the UI
    * off). A cached subtree consumed by two branches is rendered in
    * BOTH, so the rendered tree doubles per round — jstack during the
    * BENCH_r04 q_kcore spikes (249 s for ~10 s of executor work) showed
    * the driver pinned in TreeNode.generateTreeString / nodeName
    * regex-compile between jobs. Checkpointing makes each round's plan a
    * LogicalRDD leaf: O(1) plan depth, O(1) description, no re-analysis
    * of the whole history each round. Storage cost is the same
    * MEMORY_AND_DISK partitions persist would hold; the lost
    * recompute-from-lineage fault tolerance is the standard iterative-
    * algorithm trade (checkpoint discipline), documented per call site.
    */
  def checkpointed(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Release the storage of a [[checkpointed]] DataFrame NOW.
    *
    * `Dataset.unpersist()` is a no-op here: localCheckpoint persists the
    * underlying RDD directly (it never registers with the CacheManager),
    * so the Dataset-level call frees nothing and round blocks would only
    * be reclaimed asynchronously by the ContextCleaner once the RDD is
    * garbage-collected. Iterative operators (BFS, LPA) release each
    * round's blocks as soon as the next round is materialized — at scale
    * the superseded rounds would otherwise stack up in storage for the
    * whole loop. The checkpointed plan is a LogicalRDD leaf; unpersist
    * its RDD non-blocking (don't serialize executor RPCs into the round
    * loop). Safe on non-checkpointed inputs: no LogicalRDD leaf, no-op.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
