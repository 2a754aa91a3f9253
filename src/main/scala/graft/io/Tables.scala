package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over the driver fixtures (`TESTDATA.md`).
  *
  * The reference reads projected column subsets of MySQL tables via
  * SQLAlchemy (`filmETLs.ipynb#cell4:3`, `rentalFilmDAG.py:37`); our engine
  * reads the equivalent relations from parquet. Parquet is self-describing,
  * so schemas come from the file footers — [[expectedColumns]] documents the
  * contract and lets callers assert it.
  *
  * Scale note (100 TB posture): `spark.read.parquet` on a directory of
  * files partitions by `spark.sql.files.maxPartitionBytes` (128 MB default),
  * so the same call distributes across a real cluster unchanged. Column
  * pruning + predicate pushdown reach the scan automatically when callers
  * stay declarative (`select`/`filter` before any wide op).
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns each fixture table is expected to expose (FIXTURES.md §B). */
  val expectedColumns: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** Scan one fixture table. Equivalent of the reference's projected
    * `pd.read_sql` (SURVEY.md §2 S1) — callers `.select(...)` immediately so
    * Catalyst prunes the parquet scan to just the needed columns.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos via the legacy flag and
    * floor-convert to a microsecond TimestampType column (matching how
    * DuckDB/most engines narrow ns → µs). Integer `div` — a double division
    * would lose precision above 2^53 ns.
    *
    * CONFIG CONTRACT: the session should be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Bench/Verify/test
    * builders all do). As a convenience for ad-hoc sessions this method
    * sets the flag if it is still unset — a deliberate, documented session
    * side effect: later reads of *other* nanos-timestamped parquet in the
    * same session then get LongType nanos instead of an error, and should
    * convert the same way this method does. A session that explicitly set
    * the flag to false is left alone (the read then fails with Spark's
    * PARQUET_TYPE_ILLEGAL, which is what that setting asks for).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      // some fixture generations write ts as timestamp[us] WITHOUT a
      // timezone (→ TIMESTAMP_NTZ in Spark 4, which unix_millis/micros
      // reject); the session runs in UTC, so the cast re-labels the same
      // micros value as an instant without shifting it
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", raw("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** documents/embeddings feed CPU-heavy PER-ROW stages (tokenization,
    * shingle/md5 chains, winnowing folds, codecs, vector arithmetic)
    * whose parallelism is otherwise capped by the SCAN's split count —
    * and a single-row-group parquet file is ONE unsplittable partition
    * no matter its size, serializing all of that work onto one core.
    * When the scan is narrower than the session's shuffle width, spread
    * it by key with an EXPLICIT partition count (a keyless repartition
    * would be AQE-coalesced right back: coalescing sizes by shuffle
    * BYTES, which is the wrong objective for a shuffle that exists to
    * spread per-row CPU). At real corpus scale the scan arrives as many
    * splits and this is a no-op — the condition, not the repartition,
    * is the contract.
    */
  /** Memoized scan split counts, keyed by (sessionUUID, path): the split
    * count is a property of the file layout + the session's read conf,
    * not of the consuming query, but reading it off `df.rdd` forces full
    * physical planning + RDD lineage construction — a measurable
    * per-call driver cost when every documents/embeddings load probes it
    * (round-9 advice finding). First call per (session, path) pays the
    * probe; the rest read the cache. Keys are (sessionUUID, path)
    * STRINGS, not the session object, so stopped sessions are never
    * pinned — and unlike an identity hash (which the JVM can reuse after
    * a stopped session is GC'd) the UUID never aliases two sessions, so
    * a new session with different read conf can't inherit a stale split
    * count (round-10 advice finding). The residual entries are two boxed
    * values per (session, fixture table) — bounded noise. Known, accepted staleness: rewriting the parquet
    * at a memoized path within one session keeps the old split count
    * (the driver fixtures are immutable; a rewriting caller should use a
    * fresh session or the uncached overload).
    */
  private val scanSplits =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Stable per-session key for the split-count memo. Classic sessions
    * carry a true UUID (`sessionUUID` — Scala-private[sql] but
    * bytecode-public, hence the reflective read); any runtime without it
    * falls back to the identity hash (same no-pinning property, with the
    * documented reuse caveat — acceptable because such runtimes don't
    * share this JVM-local memo across session restarts in practice).
    */
  private def sessionUuid(spark: SparkSession): String =
    try spark.getClass.getMethod("sessionUUID").invoke(spark).toString
    catch { case _: ReflectiveOperationException | _: ClassCastException =>
      System.identityHashCode(spark).toHexString }

  /** `cacheKey = null` (caller-built relations whose split count is a
    * property of the upstream plan, not a stable file layout) probes on
    * every call; a non-null key memoizes the probe per session.
    */
  private[graft] def cpuSpread(df: DataFrame, key: String,
                               cacheKey: String = null): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val splits =
      if (cacheKey == null) df.rdd.getNumPartitions
      // sessionUUID, not the session object (no pinning of stopped
      // sessions) and not an identity hash (reusable after GC — a fresh
      // session could silently inherit a stale split count)
      else scanSplits.computeIfAbsent(
        s"${sessionUuid(spark)}:$cacheKey",
        _ => Integer.valueOf(df.rdd.getNumPartitions)).intValue()
    if (splits >= n) df
    else df.repartition(n, org.apache.spark.sql.functions.col(key))
  }

  def documents(spark: SparkSession, dir: String): DataFrame  =
    cpuSpread(table(spark, dir, "documents"), "doc_id", s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    cpuSpread(table(spark, dir, "embeddings"), "vec_id", s"$dir/embeddings.parquet")

  /** CSV source with an explicit schema. Schema inference is deliberately
    * not offered: at 100 TB inference costs an extra full scan and can
    * produce run-dependent types — declare the schema (SURVEY.md §1.2).
    */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines source with an explicit schema (same no-inference rule;
    * unparseable records land in the PERMISSIVE null row rather than
    * failing the job).
    */
  def readJson(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** JDBC source — the reference's ACTUAL input topology: projected
    * `pd.read_sql` against MySQL via SQLAlchemy (`filmETLs.ipynb#cell1`
    * engine setup, `rentalFilmDAG.py:15-20,37`). The driver harness feeds
    * parquet, but a user of the reference switching to this library needs
    * the same capability natively.
    *
    * Scale shape: a bare JDBC read is ONE connection pulling the whole
    * table through the driver — the anti-pattern. This helper always
    * plans a RANGE-PARTITIONED parallel read: `numPartitions` executors
    * each issue `WHERE partitionColumn BETWEEN lo AND hi` against the
    * database, so ingest bandwidth scales with executor count (and with
    * the DB's read replicas at real scale). Bounds default to a one-row
    * MIN/MAX probe query — two values over the wire — matching how
    * Sqoop/`spark.read.jdbc` deployments bootstrap. Filters and column
    * pruning push into the remote SQL (`PushedFilters` in the scan node);
    * `fetchsize` streams rows through the cursor instead of buffering
    * each partition's result set.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionColumn: String,
               numPartitions: Int = 8,
               bounds: Option[(Long, Long)] = None,
               driver: Option[String] = None,
               fetchSize: Int = 10000,
               props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("fetchsize", fetchSize.toString)
    val withDriver = driver.fold(base)(d => base.option("driver", d))
    val withProps = props.foldLeft(withDriver) { case (r, (k, v)) => r.option(k, v) }
    val (lo, hi) = bounds.getOrElse {
      // identifier quoted per the target database's dialect — unquoted
      // names case-fold differently across engines (Derby/Oracle upper,
      // Postgres lower) while Spark's JDBC writer creates quoted columns
      val qc = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
        .quoteIdentifier(partitionColumn)
      val row = withProps
        .option("dbtable", s"(SELECT MIN($qc) AS lo, MAX($qc) AS hi FROM $table) b")
        .load().head()
      (row.getAs[Number](0).longValue(), row.getAs[Number](1).longValue())
    }
    withProps
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lo.toString)
      .option("upperBound", math.max(hi, lo + 1).toString)
      .option("numPartitions", numPartitions.toString)
      .load()
  }

  /** JDBC sink — the reference's `to_sql(..., if_exists='append')` load
    * step (`filmETLs.ipynb#cell4:5`, `rentalFilmDAG.py:39`). Each
    * partition opens one connection and writes `batchsize`-row batches;
    * at scale, coalesce to a partition count the database can absorb
    * (1000 executors hammering one primary is a DB outage, not a load).
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "append",
                driver: Option[String] = None,
                batchSize: Int = 1000,
                props: Map[String, String] = Map.empty): Unit = {
    val base = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .mode(mode)
    val withDriver = driver.fold(base)(d => base.option("driver", d))
    props.foldLeft(withDriver) { case (w, (k, v)) => w.option(k, v) }.save()
  }

  /** Append/overwrite sink (SURVEY.md §2 K1). The reference appends via
    * `to_sql(..., if_exists='append')` (`filmETLs.ipynb#cell4:5`), which is
    * non-idempotent on re-run; we deliberately default to overwrite
    * (SURVEY.md §7.4.6). Partitioning by a low-cardinality key (e.g.
    * `date_id`) keeps 100 TB fact writes prunable for downstream readers.
    */
  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
            mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
