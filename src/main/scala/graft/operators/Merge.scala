package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD1 MERGE (upsert + delete) — the copy-on-write `MERGE INTO` of the
  * lakehouse formats (Delta/Iceberg/Hudi), as a pure DataFrame transform:
  * given a target snapshot and a changes batch carrying a tombstone flag,
  * produce the next snapshot where changed keys are replaced, tombstoned
  * keys disappear, and new keys append.
  *
  * Formulated WITHOUT a full-outer join: the next snapshot is
  *
  *   (target ANTI-JOIN change-keys)  UNION ALL  (changes WHERE NOT delete)
  *
  * — two relations that never overlap by construction. The anti join is
  * the only inter-relation edge, and in the overwhelmingly common case
  * (changes ≪ target) Spark broadcasts the key set, so the 100 TB target
  * is read once, filtered at full scan parallelism, and never shuffled;
  * a full-outer formulation would shuffle BOTH sides on the key every
  * batch. When the target is bucketed by the key (etl.Warehouse), even
  * a giant changes batch co-locates.
  *
  * `seqCol`: when a batch can carry several changes for one key (CDC
  * streams), the row with the highest sequence wins; ties break on the
  * tombstone (delete wins, matching "the last thing that happened was
  * removal" CDC convention), then on a hash of the remaining payload
  * columns — two same-key same-seq same-flag rows with different
  * payloads would otherwise get a partitioning-dependent row_number
  * winner, breaking the library's determinism contract (lakehouse MERGE
  * implementations fail that case outright; picking the hash-least
  * payload is deterministic AND total). Resolved with one per-key window
  * over the (small) changes batch, never over the target.
  */
object Merge {

  def scd1Merge(target: DataFrame, changes: DataFrame, key: String,
                deleteCol: String = "is_delete",
                seqCol: Option[String] = None): DataFrame = {
    val latest = seqCol match {
      case Some(seq) =>
        val payload = changes.columns
          .filter(c => c != key && c != seq && c != deleteCol)
        val payloadTieBreak =
          if (payload.isEmpty) lit(0L)
          else xxhash64(payload.map(c => col(c).cast("string")): _*)
        val w = Window.partitionBy(key)
          .orderBy(col(seq).desc, col(deleteCol).desc, payloadTieBreak.asc)
        changes.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", seq)
      case None => changes
    }
    val keys = latest.select(col(key)).distinct()
    val kept = target.join(keys, Seq(key), "left_anti")
    val applied = latest.filter(!col(deleteCol)).drop(deleteCol)
      .select(target.columns.map(col): _*)
    kept.unionByName(applied)
  }

  /** Snapshot diff — the inverse of [[scd1Merge]]: given two versions of a
    * keyed table, emit one row per changed key tagged `I` (inserted), `U`
    * (payload differs, null-safely) or `D` (deleted), carrying the new
    * payload (old payload for deletes). Unchanged keys emit nothing, so
    * `snapshotDiff(v, scd1Merge(v, batch), key)` recovers exactly the
    * effective batch — the round-trip MergeSpec asserts.
    *
    * This is the lakehouse "table_changes between versions" operation
    * computed from the versions themselves (time-travel diff, CDC
    * backfill when the change log was lost, replication drift audit).
    *
    * Scale: one full-outer shuffle join on the key — the minimum for a
    * general diff where both sides are large; when the two versions are
    * bucketed by the key (etl.Warehouse.writeBucketed) the join
    * co-locates and no shuffle happens at all. Payloads are compared
    * null-safely column-by-column inside the join projection (codegen'd,
    * no hashing pass over either side), and only changed rows survive the
    * post-join filter, so the output stays change-sized, never
    * snapshot-sized.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String): DataFrame = {
    val payload = oldSnap.columns.filter(_ != key)
    val o = oldSnap.select(col(key).as("__k"), lit(true).as("__in_old"),
      struct(payload.map(col): _*).as("__old"))
    val n = newSnap.select(col(key).as("__k"), lit(true).as("__in_new"),
      struct(payload.map(col): _*).as("__new"))
    val changed = payload
      .map(c => !(col(s"__old.$c") <=> col(s"__new.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, Seq("__k"), "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("I"))
          .when(col("__in_new").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("change_type").isNotNull)
      .select(col("__k").as(key) +: col("change_type") +:
        payload.map(c => coalesce(col(s"__new.$c"), col(s"__old.$c")).as(c)): _*)
  }
}
