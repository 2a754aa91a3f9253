package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable SpaceSaving (top-k heavy hitters) as a native Catalyst
  * aggregate — the bounded-memory answer to "most frequent keys" when the
  * key space is too large for an exact `groupBy` (at 100 TB: frequent
  * tokens/URLs/users without shuffling a billion-group aggregation; the
  * sketch is k entries per partial, merged pairwise on the combine path
  * like any other partial agg).
  *
  * Algorithm: Metwally et al., "Efficient computation of frequent and
  * top-k elements in data streams" (ICDT'05); merge rule from Agarwal et
  * al., "Mergeable summaries" (PODS'12) — an item absent from one summary
  * takes that summary's minimum count as its count AND error bound, then
  * the union is trimmed back to k by estimated count. Invariants that
  * survive ANY merge order (and are what callers should consume — the
  * estimates themselves are merge-order-dependent):
  *  - no underestimates: est(x) ≥ true_count(x) for retained x;
  *  - bounded overestimate: est(x) − true_count(x) ≤ err(x) ≤ N/k;
  *  - every true heavy hitter (true_count > N/k) is retained.
  *
  * `TypedImperativeAggregate` is the same API Spark's own
  * `percentile_approx`/`count_min_sketch` use: an opaque JVM buffer with
  * kryo-free manual serialization, partial-aggregated map-side.
  *
  * The per-eviction min scan is O(k) (a heap would be O(log k)); k here
  * is tens-to-thousands, and update cost is dominated by the hash lookup
  * on the non-evicting path, so the simple scan wins on clarity.
  */
case class SpaceSavingTopK(child: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] with Serializable {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")

  override def prettyName: String = "top_k_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer = new SpaceSavingBuffer(k)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer,
                     other: SpaceSavingBuffer): SpaceSavingBuffer =
    buffer.mergeWith(other)

  /** Entries sorted by (est desc, item asc) — a deterministic ORDER for a
    * given summary; the summary itself is merge-order-dependent. */
  override def eval(buffer: SpaceSavingBuffer): Any = {
    val rows = buffer.entries
      .sortBy { case (item, c, _) => (-c, item) }
      .map { case (item, c, e) =>
        InternalRow(UTF8String.fromString(item), c, e)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
}

/** Mutable SpaceSaving summary: item → (count, error). */
final class SpaceSavingBuffer(val k: Int) extends Serializable {
  private val counts = mutable.HashMap.empty[String, Long]
  private val errs = mutable.HashMap.empty[String, Long]

  def entries: Seq[(String, Long, Long)] =
    counts.iterator.map { case (i, c) => (i, c, errs(i)) }.toSeq

  /** Minimum count — the substitution value for items this summary
    * evicted (0 while no eviction can have happened). */
  private def minCount: Long =
    if (counts.size < k) 0L else counts.values.min

  def add(item: String): Unit = counts.get(item) match {
    case Some(c) => counts.update(item, c + 1)
    case None if counts.size < k =>
      counts.update(item, 1L); errs.update(item, 0L)
    case None =>
      // evict the min-count entry (ties broken by item for determinism
      // within a fixed arrival order); inherit its count as the error
      val (mItem, mCnt) = counts.iterator.minBy { case (i, c) => (c, i) }
      counts.remove(mItem); errs.remove(mItem)
      counts.update(item, mCnt + 1); errs.update(item, mCnt)
  }

  def mergeWith(other: SpaceSavingBuffer): SpaceSavingBuffer = {
    val mSelf = minCount
    val mOther = other.minCount
    val items = counts.keySet ++ other.counts.keySet
    val merged = items.iterator.map { i =>
      val c = counts.getOrElse(i, mSelf) + other.counts.getOrElse(i, mOther)
      val e = errs.getOrElse(i, mSelf) + other.errs.getOrElse(i, mOther)
      (i, c, e)
    }.toSeq
    val kept = merged.sortBy { case (i, c, _) => (-c, i) }.take(k)
    val out = new SpaceSavingBuffer(k)
    kept.foreach { case (i, c, e) => out.counts.update(i, c); out.errs.update(i, e) }
    out
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(counts.size)
    counts.foreach { case (i, c) =>
      out.writeUTF(i); out.writeLong(c); out.writeLong(errs(i))
    }
    out.flush()
    bos.toByteArray
  }
}

object SpaceSavingBuffer {
  def fromBytes(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val i = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf.counts.update(i, c); buf.errs.update(i, e)
    }
    buf
  }
}

/** Column surface for the sketch aggregates. */
object SketchAggregates {
  def top_k_sketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(c), k).toAggregateExpression())
}
