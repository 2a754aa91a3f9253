package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-skipping effectiveness audit: how many files a 2-D range query
  * would actually scan under each candidate layout. The warehouse
  * question behind Z-order/Hilbert (Moerkotte, "Small materialized
  * aggregates", VLDB'98 — min/max zone maps; the layout decides how
  * tight they are): rows are bucketed into `buckets` equal "files" in
  * layout-key order, each file keeps (min, max) of both dimensions, and
  * a file must be scanned iff its bounding box intersects the query
  * rectangle. Comparing linear / Z-order / Hilbert orderings on the
  * same data and rectangle turns the layout choice into one measured
  * number instead of folklore.
  *
  * Everything is exact integer arithmetic over the same masked 16-bit
  * coordinates ([[Hilbert]]/[[ZOrder]] domain): NTILE file assignment
  * via the range-partitioned [[GlobalRank.ntileByRange]] with the
  * event_id tie-break, min/max zone maps, and a rectangle-overlap
  * count — bit-identical to the oracle's NTILE replay.
  *
  * Scale: per layout one range exchange (the sort a real layout rewrite
  * pays), one map-side-combined zone-map aggregation over `buckets`
  * groups, and a 1-row fold. The three layouts union at the end.
  *
  * Output: (layout, n_files, n_scanned), one row per layout.
  */
object LayoutPrune {

  /** 16-bit two-dimensional Morton interleave of columns hx, hy — the
    * SQL text is shared verbatim with the oracle.
    */
  private[operators] def zInterleaveSql(bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"(((hx >> $i) & 1) << ${2 * i})", s"(((hy >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** The masked 16-bit coordinate projection (event_id, hx, hy) every
    * layout keys over — exposed for the soundness property spec.
    */
  private[graft] def maskedBase(events: DataFrame, bits: Int): DataFrame = {
    val n1 = (1L << bits) - 1
    events.select(col("event_id"),
      expr(s"CAST(user_id AS BIGINT) & $n1").as("hx"),
      expr(s"CAST(FLOOR(value) AS BIGINT) & $n1").as("hy"))
  }

  /** The three candidate layout keys over a masked base — (name, keyed)
    * pairs, each carrying (event_id, hx, hy, k).
    */
  private[graft] def keyedLayouts(base: DataFrame,
                                      bits: Int): Seq[(String, DataFrame)] = {
    val n1 = (1L << bits) - 1
    Seq(
      "1_linear" -> base.withColumn("k", col("hx") * (n1 + 1) + col("hy")),
      "2_zorder" -> base.withColumn("k", expr(zInterleaveSql(bits))),
      "3_hilbert" -> base.join(
        Hilbert.hilbertValue(base, "event_id", "hx", "hy", bits)
          .withColumnRenamed("hval", "k"), "event_id"))
  }

  /** Row→file assignment in layout-key order: NTILE over `buckets`
    * equal files via the range-partitioned [[GlobalRank.ntileByRange]]
    * with the event_id tie-break — the "write the sorted data in
    * `buckets` files" stand-in a layout rewrite pays for real.
    */
  private[graft] def tiledFiles(keyed: DataFrame, buckets: Int): DataFrame =
    GlobalRank.ntileByRange(
      keyed.select(col("event_id"), col("hx"), col("hy"), col("k")),
      buckets, Seq("k", "event_id"), "file_id")

  /** Per-file (min, max) zone maps of both dimensions. */
  private[graft] def fileZones(keyed: DataFrame, buckets: Int): DataFrame =
    tiledFiles(keyed, buckets).groupBy("file_id").agg(
      min("hx").as("minx"), max("hx").as("maxx"),
      min("hy").as("miny"), max("hy").as("maxy"))

  /** The zone-map overlap predicate: a file must be scanned iff its
    * bounding box intersects the query rectangle. Shared by the audit
    * and the soundness spec so they can't drift apart.
    */
  private[graft] def scannedPredicate(rx1: Long, rx2: Long, ry1: Long,
                                          ry2: Long): org.apache.spark.sql.Column =
    !(col("maxx") < rx1 || col("minx") > rx2 ||
      col("maxy") < ry1 || col("miny") > ry2)

  /** Prune statistics for the linear / zorder / hilbert layouts of the
    * events table on (user_id, floor(value)), query rectangle
    * [rx1, rx2] × [ry1, ry2].
    */
  def layoutPruneStats(events: DataFrame, bits: Int = 16, buckets: Int = 64,
                       rx1: Long = 10L, rx2: Long = 40L,
                       ry1: Long = 50L, ry2: Long = 150L): DataFrame = {
    require(bits >= 1 && bits <= 16 && buckets >= 1, "bits in [1,16], buckets >= 1")
    val base = graft.Caching.materialize(maskedBase(events, bits))

    def stats(layout: String, keyed: DataFrame): DataFrame =
      fileZones(keyed, buckets)
        .agg(count(lit(1)).as("n_files"),
          sum(when(scannedPredicate(rx1, rx2, ry1, ry2), 1L).otherwise(0L))
            .as("n_scanned"))
        .select(lit(layout).as("layout"), col("n_files"), col("n_scanned"))

    keyedLayouts(base, bits)
      .map { case (name, keyed) => stats(name, keyed) }
      .reduce(_ unionByName _)
  }

  /** DuckDB replay: identical masked coordinates, NTILE file
    * assignment, zone maps and overlap predicate per layout; the
    * Hilbert key reuses [[Hilbert.levelCtesSql]] verbatim.
    */
  def layoutPruneOracleSql(bits: Int = 16, buckets: Int = 64,
                           rx1: Long = 10L, rx2: Long = 40L,
                           ry1: Long = 50L, ry2: Long = 150L): String = {
    val n1 = (1L << bits) - 1
    def block(layout: String, keyedRel: String): String =
      s"""SELECT '$layout' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
         |       CAST(SUM(CASE WHEN NOT (maxx < $rx1 OR minx > $rx2 OR
         |                               maxy < $ry1 OR miny > $ry2)
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned
         |FROM (
         |  SELECT file_id, MIN(hx) AS minx, MAX(hx) AS maxx,
         |         MIN(hy) AS miny, MAX(hy) AS maxy
         |  FROM (SELECT *, NTILE($buckets) OVER (ORDER BY k, event_id) AS file_id
         |        FROM $keyedRel) t
         |  GROUP BY 1)""".stripMargin
    s"""WITH base AS (
       |  SELECT event_id, (CAST(user_id AS BIGINT) & $n1) AS hx,
       |         (CAST(FLOOR(value) AS BIGINT) & $n1) AS hy
       |  FROM events),
       |lin AS (SELECT *, hx * ${n1 + 1} + hy AS k FROM base),
       |zord AS (SELECT *, ${zInterleaveSql(bits)} AS k FROM base),
       |l0 AS (SELECT event_id, hx, hy, CAST(0 AS BIGINT) AS acc FROM base),
       |${Hilbert.levelCtesSql(bits)},
       |hilb AS (
       |  SELECT b.event_id, b.hx, b.hy, l.acc AS k
       |  FROM base b JOIN l$bits l ON l.event_id = b.event_id)
       |${block("1_linear", "lin")}
       |UNION ALL
       |${block("2_zorder", "zord")}
       |UNION ALL
       |${block("3_hilbert", "hilb")}""".stripMargin
  }
}
