package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LayoutPrune

/** Soundness of the data-skipping audit, property-checked on random
  * rectangles: the audit's n_scanned may legitimately over-approximate
  * (zone maps are conservative — a box can intersect the rectangle
  * while holding no matching row), and no ordering is promised to beat
  * another; what MUST hold on every input is
  *   (a) 0 ≤ n_scanned ≤ n_files,
  *   (b) every in-rectangle row lives in a SCANNED file (pruning never
  *       loses a result row — the property that makes skipping safe),
  *   (c) the aggregate counts equal the per-file zone detail they
  *       summarize.
  */
class LayoutPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bits = 10
  private val buckets = 8

  test("audit soundness on random data and random rectangles") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      // event-shaped rows; coordinates spread over the masked domain
      val n = 400 + rnd.nextInt(400)
      val rows = (1 to n).map { i =>
        (i.toLong, rnd.nextInt(1 << bits).toLong, rnd.nextInt(1 << bits).toDouble)
      }
      val events = rows.toDF("event_id", "user_id", "value")
      // random rectangle, occasionally degenerate/empty-intersection
      val rx1 = rnd.nextInt(1 << bits).toLong
      val rx2 = rx1 + rnd.nextInt(1 << (bits - 1))
      val ry1 = rnd.nextInt(1 << bits).toLong
      val ry2 = ry1 + rnd.nextInt(1 << (bits - 1))

      val stats = LayoutPrune
        .layoutPruneStats(events, bits, buckets, rx1, rx2, ry1, ry2)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(stats.keySet === Set("1_linear", "2_zorder", "3_hilbert"))

      val base = LayoutPrune.maskedBase(events, bits).cache()
      for ((layout, keyed) <- LayoutPrune.keyedLayouts(base, bits)) {
        val (nFiles, nScanned) = stats(layout)
        // (a) counts are a sane partition of the file set
        assert(nScanned >= 0 && nScanned <= nFiles,
          s"$layout trial $trial: $nScanned of $nFiles")
        val zones = LayoutPrune.fileZones(keyed, buckets).cache()
        val scannedFiles = zones
          .filter(LayoutPrune.scannedPredicate(rx1, rx2, ry1, ry2))
          .select("file_id").as[Int].collect().toSet
        // (c) the audit's aggregate equals the per-file detail
        assert(zones.count() === nFiles, s"$layout trial $trial: n_files")
        assert(scannedFiles.size.toLong === nScanned,
          s"$layout trial $trial: n_scanned vs zone detail")
        // (b) SOUNDNESS: every in-rectangle row's file is scanned
        val lostRows = LayoutPrune.tiledFiles(keyed, buckets)
          .filter(col("hx").between(rx1, rx2) && col("hy").between(ry1, ry2))
          .filter(!col("file_id").isInCollection(
            if (scannedFiles.isEmpty) Set(-1) else scannedFiles))
          .count()
        assert(lostRows === 0L,
          s"$layout trial $trial: $lostRows in-rectangle rows in pruned files")
        zones.unpersist()
      }
      base.unpersist()
      spark.catalog.clearCache()
    }
  }

  test("full-domain rectangle scans every nonempty file; empty domain prunes all") {
    val events = (1 to 300).map { i =>
      (i.toLong, (i % 700).toLong, (i % 900).toDouble)
    }.toDF("event_id", "user_id", "value")
    val full = LayoutPrune
      .layoutPruneStats(events, bits, buckets, 0L, (1L << bits) - 1, 0L, (1L << bits) - 1)
      .collect()
    full.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"${r.getString(0)}: full rectangle must scan all files"))
    // rectangle outside the masked domain: nothing can intersect
    val none = LayoutPrune
      .layoutPruneStats(events, bits, buckets, (1L << bits) + 5, (1L << bits) + 9, 0L, 5L)
      .collect()
    none.foreach(r => assert(r.getLong(2) === 0L,
      s"${r.getString(0)}: out-of-domain rectangle must prune everything"))
    spark.catalog.clearCache()
  }
}
