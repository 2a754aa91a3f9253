package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge

/** SCD1 MERGE: update/insert/delete semantics, CDC latest-wins sequencing,
  * and the broadcast-anti-join plan shape for small change batches.
  */
class MergeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def snapshot = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "amount")

  test("update replaces, delete removes, insert appends, untouched rows survive") {
    val changes = Seq(
      (2L, "b2", 21.0, false),  // update
      (3L, "c", 30.0, true),    // delete
      (4L, "d", 40.0, false)    // insert
    ).toDF("id", "name", "amount", "is_delete")
    val out = Merge.scd1Merge(snapshot, changes, "id")
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0)))
  }

  test("seqCol: the highest sequence wins; delete beats update on a tie") {
    val changes = Seq(
      (2L, "first", 1.0, false, 1L),
      (2L, "second", 2.0, false, 2L),   // latest non-delete → wins
      (3L, "upd", 3.0, false, 5L),
      (3L, "del", 0.0, true, 5L)        // same seq, tombstone wins
    ).toDF("id", "name", "amount", "is_delete", "seq")
    val out = Merge.scd1Merge(snapshot, changes, "id", seqCol = Some("seq"))
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set((1L, "a", 10.0), (2L, "second", 2.0)))
  }

  test("seqCol: a full tie (same key, seq, flag) resolves deterministically") {
    // two candidate payloads with identical (key, seq, tombstone): the
    // winner is the hash-least payload — the same under ANY partitioning,
    // where a bare (seq, flag) ordering left row_number to pick whichever
    // row arrived first
    val changes = Seq(
      (2L, "payload_x", 7.0, false, 3L),
      (2L, "payload_y", 8.0, false, 3L)
    ).toDF("id", "name", "amount", "is_delete", "seq")
    val once = Merge.scd1Merge(snapshot, changes, "id", seqCol = Some("seq"))
      .as[(Long, String, Double)].collect().toSet
    (1 to 3).foreach { p =>
      val again = Merge.scd1Merge(snapshot, changes.repartition(p), "id",
        seqCol = Some("seq")).as[(Long, String, Double)].collect().toSet
      assert(again === once, s"partitioning $p changed the merge winner")
    }
  }

  test("empty changes batch is the identity") {
    val empty = Seq.empty[(Long, String, Double, Boolean)]
      .toDF("id", "name", "amount", "is_delete")
    val out = Merge.scd1Merge(snapshot, empty, "id")
    assert(out.exceptAll(snapshot).isEmpty && snapshot.exceptAll(out).isEmpty)
  }

  test("snapshotDiff recovers the effective change batch (merge round-trip)") {
    val changes = Seq(
      (2L, "b2", 21.0, false),  // update
      (3L, "c", 30.0, true),    // delete
      (4L, "d", 40.0, false)    // insert
    ).toDF("id", "name", "amount", "is_delete")
    val next = Merge.scd1Merge(snapshot, changes, "id")
    val diff = Merge.snapshotDiff(snapshot, next, "id")
      .as[(Long, String, String, Double)].collect().toSet
    assert(diff === Set(
      (2L, "U", "b2", 21.0),
      (3L, "D", "c", 30.0),   // deletes carry the old payload
      (4L, "I", "d", 40.0)))
  }

  test("snapshotDiff of identical versions is empty; null payloads compare null-safely") {
    val withNulls = Seq(
      (1L, Option.empty[String], 10.0), (2L, Option("b"), 20.0)
    ).toDF("id", "name", "amount")
    assert(Merge.snapshotDiff(withNulls, withNulls, "id").isEmpty)
    // null -> value is an update, not a spurious no-op
    val filled = Seq(
      (1L, Option("now_set"), 10.0), (2L, Option("b"), 20.0)
    ).toDF("id", "name", "amount")
    val diff = Merge.snapshotDiff(withNulls, filled, "id")
      .as[(Long, String, String, Double)].collect().toSet
    assert(diff === Set((1L, "U", "now_set", 10.0)))
  }

  test("plan: a small changes batch broadcasts — the target never shuffles") {
    val changes = Seq((2L, "b2", 21.0, false)).toDF("id", "name", "amount", "is_delete")
    val plan = Merge.scd1Merge(snapshot, changes, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti join for a small batch:\n$plan")
  }
}
