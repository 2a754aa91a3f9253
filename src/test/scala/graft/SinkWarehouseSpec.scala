package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Warehouse
import graft.io.Tables
import graft.streaming.EventStreams

/** The two write-side scale features: the exactly-once foreachBatch sink
  * (replay-idempotence checked directly) and the bucketed warehouse
  * layout (shuffle elimination checked against the physical plan).
  */
class SinkWarehouseSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("foreachBatch sink delivers every row once; batch replay is a no-op") {
    val src = java.nio.file.Files.createTempDirectory("graft_fb_src").toString
    val out = java.nio.file.Files.createTempDirectory("graft_fb_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_fb_chk").toString

    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value").cache()
    events.filter($"event_id" < 600).coalesce(1).write.mode("append").parquet(src)

    val stream = spark.readStream.schema(events.filter($"event_id" < 600).schema).parquet(src)
    val q = EventStreams.idempotentParquetSink(stream, out, chk)
    try q.processAllAvailable() finally q.stop()

    val sunk = spark.read.parquet(out)
    val n = events.filter($"event_id" < 600).count()
    assert(sunk.drop("batch_id").count() === n)
    assert(sunk.select("event_id").distinct().count() === n)

    // simulate the sink-wrote-but-checkpoint-didn't-commit crash: replay
    // the same (batchId, data) — the keyed overwrite must leave the sink
    // contents identical, not doubled
    val batchIds = sunk.select("batch_id").distinct().as[Long].collect()
    val replayId = batchIds.min
    EventStreams.writeBatchIdempotent(
      events.filter($"event_id" < 600), replayId, out)
    val after = spark.read.parquet(out)
    assert(after.count() === n, "replayed batch must overwrite, not append")
    assert(after.select("event_id").distinct().count() === n)
    events.unpersist()
  }

  test("upsertByKey: updates replace, inserts append, others pass through") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val updates = Seq((2L, "b2", 22.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val merged = Warehouse.upsertByKey(base, updates, "k").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(merged === Map(
      1L -> (("a", 10.0)), 2L -> (("b2", 22.0)),
      3L -> (("c", 30.0)), 4L -> (("d", 40.0))))
  }

  test("bucketed join skips the shuffle on both sides") {
    Warehouse.buildBucketed(spark, sfDir, buckets = 4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge plan so bucketing (not broadcast) is what's tested
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Warehouse.bucketedSpendPerSegment(spark)
      val plan = df.queryExecution.executedPlan
      val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join, got:\n$plan")
      val shufflesUnderJoin = smj.get.collect { case s: ShuffleExchangeExec => s }
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed join must not shuffle its inputs:\n${smj.get}")

      // and the result matches the unbucketed formulation
      val expect = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("segment_spend"), count(lit(1)).as("n_orders"))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      val got = df.collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      assert(got === expect)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }

  test("compact rewrites a many-file mess into the target file count, losslessly") {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val messy = java.nio.file.Files.createTempDirectory("graft_cm_in").toString
    val tidy = java.nio.file.Files.createTempDirectory("graft_cm_out").toString
    val data = (1L to 10000L).map(i => (i, i % 97)).toDF("id", "v")
    data.repartition(200).write.mode("overwrite").parquet(messy) // 200 tiny files
    val src = spark.read.parquet(messy)
    assert(src.select(input_file_name()).distinct().count() === 200)

    val rows = graft.etl.Warehouse.compact(src, tidy, targetRecords = 2500,
      sortCols = Seq("id"))
    assert(rows === 10000)
    val out = spark.read.parquet(tidy)
    // range-partition boundaries are sampled, so partitions are only
    // near-equal and the writer may split a few — the contract is "a
    // handful of right-sized files", not an exact count
    val nFiles = out.select(input_file_name()).distinct().count()
    assert(nFiles >= 4 && nFiles <= 10, s"got $nFiles files from 200")
    // lossless: same multiset of rows
    assert(out.count() === 10000)
    assert(out.join(data, Seq("id", "v"), "left_anti").count() === 0)
    // range-sorted files: per-file id ranges are disjoint quarters
    val ranges = out.groupBy(input_file_name())
      .agg(org.apache.spark.sql.functions.max(col("id")).as("hi"),
        org.apache.spark.sql.functions.min(col("id")).as("lo"))
      .select("lo", "hi").as[(Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "file ranges overlap")
      case _ => ()
    }
  }
}
