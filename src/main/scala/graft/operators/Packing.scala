package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.text.TextOps

/** Training-sequence packing (concat-and-chunk): lay all documents out on
  * one conceptual token tape in a deterministic global order and cut the
  * tape into fixed-capacity context windows — the standard corpus → batch
  * prep for LLM training (north star op; beyond the reference surface,
  * SURVEY.md §2.1).
  *
  * The only global dependency is an EXCLUSIVE RUNNING TOTAL of token
  * counts over the document order. A window `SUM() OVER (ORDER BY …)`
  * computes it but collapses every row into ONE window partition — fine
  * for the DuckDB oracle at sf0.01, broken at 100 TB. [[withRunningTotal]]
  * instead uses the classic two-pass distributed prefix sum: range
  * partition + local sort gives a global order, pass 1 reduces each
  * partition to one subtotal (collected to the driver: #partitions values,
  * not #rows), pass 2 streams each partition once adding its broadcast
  * offset. Both passes touch each row exactly once and nothing data-sized
  * ever leaves the executors.
  */
object Packing {

  /** Exclusive running total of `valueCol` (must be LONG, non-null) over
    * the global total order given by `sortCols` (must be unique in
    * combination), appended as `outCol`. Deterministic: the running total
    * depends only on the global order, not on where Spark's sampled range
    * boundaries land.
    *
    * This is the sanctioned per-partition-imperative RDD use (same rule as
    * GlobalRank.withGlobalRowNumber): the DataFrame API has no
    * partition-offset primitive.
    */
  def withRunningTotal(df: DataFrame, sortCols: Seq[String], valueCol: String,
                       outCol: String): DataFrame = {
    require(!df.columns.contains(outCol), s"input already defines $outCol")
    val spark = df.sparkSession
    val cols = sortCols.map(col)
    val sorted = df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType,
      s"$valueCol must be LONG (cast upstream)")
    // NOT cached: both passes run jobs over the same RDD object, so the
    // range-partition exchange's map output is computed once and the
    // second job reuses the shuffle files (its map stage is skipped).
    // The repeated cost is only the partition-local sort on the read
    // side — cheaper than parking a corpus-sized RDD in block storage,
    // and nothing leaks (an `rdd.cache()` here would sit outside the
    // `catalog.clearCache()` contract until GC).
    val rdd = sorted.rdd
    // pass 1: one subtotal per partition → driver (tiny: #partitions longs)
    val partSums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r => val prev = acc; acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ prev) }
    }
    val res = spark.createDataFrame(out, schema)
    res
  }

  /** Assign every document to its context window: documents are
    * concatenated in `doc_id` order onto a token tape cut every `capacity`
    * tokens. Emits per document the pack it STARTS in, the offset within
    * that pack, and whether it spans a pack boundary (gets split across
    * two or more training sequences).
    *
    * Tokenization is the shared whitespace rule ([[TextOps.tokens]]);
    * empty documents contribute zero tokens but keep a row (their pack is
    * where the tape currently stands).
    */
  def packSequences(documents: DataFrame, capacity: Int = 2048): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val toks = documents.select(
      col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    withRunningTotal(toks, Seq("doc_id"), "n_tokens", "prev")
      .select(
        col("doc_id"), col("n_tokens"),
        // `div`, not `/`: Column./ is IEEE double division, which silently
        // loses precision past 2^53 tokens — integer division stays exact
        expr(s"prev div $capacity").as("pack_id"),
        (col("prev") % capacity).as("pack_offset"),
        (col("prev") % capacity + col("n_tokens") > capacity).as("spans_boundary"))
  }
}
