package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GDPR/CCPA erasure-propagation audit: given a deterministic victim set
  * of customers (right-to-be-forgotten requests), report — per table in
  * the cascade customer → orders → lineitem — how many rows the erasure
  * touches and an order-independent checksum of the SURVIVING keys, so a
  * deletion job can be verified end-to-end without diffing tables: run
  * the audit, delete, recompute key checksums, compare.
  *
  * The victim set here is `c_custkey % mod = 0` — a deterministic
  * stand-in for the request table a real pipeline would feed in.
  *
  * Exactness: the checksum is the [[graft.analytics.Metrics.tableChecksum]]
  * convention — md5 of the canonical key string folded to a 60-bit long,
  * summed in DECIMAL(38,0) mod 2⁶¹ (order-independent, replayable in
  * DuckDB byte-for-byte).
  *
  * Scale shape: victims are |customer|/mod — dim-scaled, broadcast to
  * flag customers and orders (swap to a shuffle join if the request
  * table ever outgrows broadcast); the lineitem leg joins the flagged
  * orders on the co-partitioned l_orderkey = o_orderkey key, ONE shuffle.
  * Each audit row is a map-side-combined aggregate; no window, no
  * driver-side state.
  *
  * Output: (table_name, n_total, n_affected, checksum_remaining).
  */
object Erasure {

  private val Fold = 1L << 61

  private def h60(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long")

  private def auditRow(name: String, flagged: DataFrame, key: Column): DataFrame =
    flagged.select(col("aff"), h60(key).as("h"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("aff"), 1L).otherwise(0L)).as("n_affected"),
        expr(s"COALESCE(CAST(SUM(CASE WHEN NOT aff THEN CAST(h AS DECIMAL(38,0)) " +
          s"ELSE CAST(0 AS DECIMAL(38,0)) END) % $Fold AS BIGINT), 0)")
          .as("checksum_remaining"))
      .select(lit(name).as("table_name"), col("n_total"), col("n_affected"),
        col("checksum_remaining"))

  def erasureAudit(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                   mod: Long = 100L): DataFrame = {
    require(mod >= 1, "victim modulus must be >= 1")
    val victims = customer.filter(col("c_custkey") % mod === 0)
      .select(col("c_custkey").as("vk"))
    val custFlagged = customer.select(col("c_custkey"))
      .join(broadcast(victims), col("c_custkey") === col("vk"), "left")
      .select(col("c_custkey"), col("vk").isNotNull.as("aff"))
    val ordFlagged = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(victims), col("o_custkey") === col("vk"), "left")
      .select(col("o_orderkey"), col("vk").isNotNull.as("aff"))
    val liFlagged = lineitem.select(col("l_orderkey"), col("l_linenumber"))
      .join(ordFlagged.select(col("o_orderkey"), col("aff")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("aff"))
    auditRow("customer", custFlagged, col("c_custkey").cast("string"))
      .unionByName(auditRow("orders", ordFlagged,
        col("o_orderkey").cast("string")))
      .unionByName(auditRow("lineitem", liFlagged,
        concat_ws("|", col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"))))
  }

  /** DuckDB replay of [[erasureAudit]]. */
  def erasureAuditOracleSql(mod: Long = 100L): String = {
    def fold(keyExpr: String) =
      s"""COALESCE(CAST(SUM(CASE WHEN NOT aff THEN
         |           ('0x' || substring(md5($keyExpr), 1, 15))::BIGINT
         |           ELSE 0 END) % $Fold AS BIGINT), 0)""".stripMargin
    s"""WITH victims AS (
       |  SELECT c_custkey AS vk FROM customer WHERE c_custkey % $mod = 0),
       |cf AS (
       |  SELECT c.c_custkey, v.vk IS NOT NULL AS aff
       |  FROM customer c LEFT JOIN victims v ON c.c_custkey = v.vk),
       |of AS (
       |  SELECT o.o_orderkey, v.vk IS NOT NULL AS aff
       |  FROM orders o LEFT JOIN victims v ON o.o_custkey = v.vk),
       |lf AS (
       |  SELECT l.l_orderkey, l.l_linenumber, o.aff
       |  FROM lineitem l JOIN of o ON l.l_orderkey = o.o_orderkey)
       |SELECT 'customer' AS table_name, COUNT(*) AS n_total,
       |       CAST(SUM(CASE WHEN aff THEN 1 ELSE 0 END) AS BIGINT) AS n_affected,
       |       ${fold("CAST(c_custkey AS VARCHAR)")} AS checksum_remaining
       |FROM cf
       |UNION ALL
       |SELECT 'orders', COUNT(*),
       |       CAST(SUM(CASE WHEN aff THEN 1 ELSE 0 END) AS BIGINT),
       |       ${fold("CAST(o_orderkey AS VARCHAR)")}
       |FROM of
       |UNION ALL
       |SELECT 'lineitem', COUNT(*),
       |       CAST(SUM(CASE WHEN aff THEN 1 ELSE 0 END) AS BIGINT),
       |       ${fold("CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)")}
       |FROM lf""".stripMargin
  }
}
