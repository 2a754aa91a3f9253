package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refZ(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference Morton interleave") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(1 << 21).toLong, rnd.nextInt(1 << 21).toLong))
    val got = rows.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === refZ(a, b, 21), s"($a,$b)") }
  }

  test("z-clustering tightens per-file ranges in BOTH dimensions") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 20000).map(_ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)).toDF("a", "b")
    def avgRanges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_z_").toString
      df.write.mode("overwrite").parquet(dir)
      val r = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max($"a") - min($"a")).as("ra"), (max($"b") - min($"b")).as("rb"))
        .agg(avg($"ra"), avg($"rb")).as[(Double, Double)].head()
      r
    }
    val (za, zb) = avgRanges(ZOrder.clusterByZ(rows, "a", "b", 16, bits = 10))
    // baseline: single-key range sort — perfect on a, hopeless on b
    val (sa, sb) = avgRanges(rows.repartitionByRange(16, $"a").sortWithinPartitions("a"))
    assert(sa < 100, s"sanity: single-key sort clusters a ($sa)")
    assert(sb > 900, s"sanity: single-key sort cannot cluster b ($sb)")
    // z-order: both dimensions well under the full 1024 range
    assert(za < 512 && zb < 512, s"z ranges ($za, $zb) should be tight in both dims")
  }
}
