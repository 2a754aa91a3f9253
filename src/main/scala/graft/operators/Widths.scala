package graft.operators

/** The house width discipline for count-derivable exchanges (round-13
  * verdict #7): every exchange whose input row count is KNOWN (or upper-
  * boundable) before the stage runs must be sized from that count, not
  * left at the fixed session width. Two probe-caught scale bugs were this
  * exact class — q_link_pred's wedge exchanges (round 11: 62 GB spill at
  * sf1.0) and dedup_cosine_pairs' candidate-distinct exchange (round 12:
  * 106 GB spill, 53× at 10× data) — and both fixes were this same
  * arithmetic. One implementation prevents the third occurrence.
  *
  * Calibration (round 11, measured): at 8M rows/partition a per-task
  * hash-aggregate map next to 31 concurrent siblings still tripped
  * Spark's sort-based fallback and spilled; 2M rows/partition keeps every
  * per-task map at ~tens of MB, comfortably inside the execution-memory
  * share at local[32] AND on any sane executor (the constant is per-TASK,
  * so it transfers to a 1000-executor cluster unchanged).
  *
  * Floor at the session width: when the count can't push the width past
  * `spark.sql.shuffle.partitions`, callers skip inserting an explicit
  * exchange entirely, so small inputs keep their pinned plan shape
  * (plan_snapshots.txt) — [[partitionsFor]] returning == sessionParts is
  * the "don't touch the plan" signal. Cap at 4096: beyond that, task-
  * scheduling overhead dominates on any realistic cluster and the caller
  * should be salting or re-thinking the key instead.
  */
object Widths {

  /** Calibrated rows per exchange partition — see scaladoc above. */
  val RowsPerPartition: Long = 2000000L

  /** Maximum adaptive width — see scaladoc above. */
  val MaxPartitions: Long = 4096L

  /** Exchange width for a stage that will materialize ~`rows` rows:
    * max(session width, rows / 2M), capped at 4096. Monotone in `rows`,
    * so an upper BOUND on the count is a safe (conservative-wide) input.
    */
  def partitionsFor(rows: Long, sessionParts: Int): Int =
    math.min(MaxPartitions,
      math.max(sessionParts.toLong, rows / RowsPerPartition)).toInt
}
