package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge
import graft.streaming.CdcStreams

// top-level: nested case classes break the encoder's codegen constructor
case class CdcChange(id: Long, name: String, amount: Double, is_delete: Boolean)

/** Streaming CDC apply vs its batch twin: folding micro-batches of changes
  * into versioned snapshots must land on the same final state as batch
  * MERGEs applied in order, and every intermediate version is a valid
  * snapshot (time travel).
  */
class CdcStreamSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("two micro-batches of changes land on the batch-merge state; versions time-travel") {
    val initial = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amount")
    val batch1 = Seq(CdcChange(2L, "b2", 21.0, false), CdcChange(4L, "d", 40.0, false))
    val batch2 = Seq(CdcChange(3L, "c", 0.0, true), CdcChange(4L, "d2", 41.0, false))

    val tableDir = java.nio.file.Files.createTempDirectory("graft_cdc_tbl").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_cdc_chk").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[CdcChange]
    val q = CdcStreams.cdcApply(stream.toDF(), initial, tableDir, chk, "id")
    try {
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    // final snapshot == the batch twin applied batch-by-batch
    val expected = Merge.scd1Merge(
      Merge.scd1Merge(initial, batch1.toDF(), "id"), batch2.toDF(), "id")
    val got = CdcStreams.snapshot(spark, tableDir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d2", 41.0)))

    // time travel: v0 is the seed, v1 reflects only batch1
    val v0 = CdcStreams.snapshotAsOf(spark, tableDir, 0L)
    assert(v0.exceptAll(initial).isEmpty && initial.exceptAll(v0).isEmpty)
    val v1 = CdcStreams.snapshotAsOf(spark, tableDir, 1L)
    assert(v1.as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    assert(CdcStreams.versions(tableDir) === Seq(0L, 1L, 2L))
    val missing = intercept[IllegalArgumentException] {
      CdcStreams.snapshotAsOf(spark, tableDir, 9L)
    }
    assert(missing.getMessage.contains("have: 0, 1, 2"))

    // version audit (0 -> 2]: one update (2), one delete (3), one insert (4)
    val diff = CdcStreams.versionDiff(spark, tableDir, 0L, 2L, "id")
      .select("change_type", "id").as[(String, Long)].collect().toSet
    assert(diff === Set(("U", 2L), ("D", 3L), ("I", 4L)))
  }

  test("latestVersion ignores stray non-version entries") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_vers").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/v0")
    Seq((1L, "b")).toDF("id", "name").write.parquet(s"$dir/v3")
    new java.io.File(s"$dir/v_tmp").mkdir()      // editor/backup dropping
    new java.io.File(s"$dir/_SUCCESS").createNewFile()
    assert(CdcStreams.latestVersion(dir) === s"$dir/v3")
    val onlyJunk = java.nio.file.Files.createTempDirectory("graft_cdc_junk").toString
    new java.io.File(s"$onlyJunk/_SUCCESS").createNewFile()
    val e = intercept[IllegalArgumentException] { CdcStreams.latestVersion(onlyJunk) }
    assert(e.getMessage.contains("no snapshot versions"))
  }

  test("a replayed micro-batch overwrites its own version (idempotent sink)") {
    val initial = Seq((1L, "a", 10.0)).toDF("id", "name", "amount")
    val tableDir = java.nio.file.Files.createTempDirectory("graft_cdc_tbl2").toString
    val chk1 = java.nio.file.Files.createTempDirectory("graft_cdc_chk2").toString
    implicit val sqlCtx = spark.sqlContext

    val s1 = MemoryStream[CdcChange]
    val q1 = CdcStreams.cdcApply(s1.toDF(), initial, tableDir, chk1, "id")
    try { s1.addData(CdcChange(2L, "b", 20.0, false)); q1.processAllAvailable() }
    finally q1.stop()

    // fresh checkpoint replays batch 0 over the same table dir: the
    // rewrite of v1 must not double-apply (insert stays one row)
    val chk2 = java.nio.file.Files.createTempDirectory("graft_cdc_chk3").toString
    val s2 = MemoryStream[CdcChange]
    val q2 = CdcStreams.cdcApply(s2.toDF(), initial, tableDir, chk2, "id")
    try { s2.addData(CdcChange(2L, "b", 20.0, false)); q2.processAllAvailable() }
    finally q2.stop()

    val got = CdcStreams.snapshot(spark, tableDir)
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "a", 10.0), (2L, "b", 20.0)))
  }
}
