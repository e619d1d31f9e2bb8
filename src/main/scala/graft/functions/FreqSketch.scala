package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate`.
  *
  * Each task keeps at most `capacity` (term, counter) entries; counters
  * merge with the mergeable-summaries rule (combine, then subtract the
  * (capacity+1)-th largest counter and drop non-positives), which
  * preserves the MG guarantee under ANY merge tree — the property that
  * makes the sketch shuffle-safe: only O(capacity × partitions) entries
  * ever cross the wire, independent of corpus size or vocabulary.
  *
  * Guarantee (Misra-Gries '82; Agarwal et al. "Mergeable Summaries",
  * PODS'12): for every term, trueCount − estimate ≤ N / (capacity+1).
  * Hence every term with trueCount > N/(capacity+1) is present in the
  * final sketch. A caller that wants EXACT θ-heavy hitters runs the
  * sketch with capacity > 1/θ, then re-counts only the returned
  * candidate set in a second pass (see `text.CorpusStats.heavy_hitters`)
  * — the two-pass algorithm is deterministic and exact while touching
  * only O(capacity) terms in pass two.
  */
case class MisraGries(
    term: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  require(capacity > 0 && capacity <= 65536, "capacity out of range")

  override def children: Seq[Expression] = Seq(term)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val t = term.eval(input)
    if (t != null) buf.offer(t.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: MGBuffer): Any = {
    // deterministic output order: estimate desc, then term asc
    val entries = buf.entries.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val entries = buf.entries
    var bytes = 4
    val encoded = entries.map { case (t, c) =>
      val b = t.getBytes(StandardCharsets.UTF_8)
      bytes += 4 + b.length + 8
      (b, c)
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(encoded.length)
    encoded.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGBuffer(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong
      buf.offer(new String(b, StandardCharsets.UTF_8), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(term = cs(0))
}

/** Bounded counter map with the Misra-Gries overflow rule. */
final class MGBuffer(val capacity: Int) {
  private val counts = new java.util.HashMap[String, Long](capacity * 2)

  def entries: Array[(String, Long)] = {
    val out = new Array[(String, Long)](counts.size)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = (e.getKey, e.getValue)
      i += 1
    }
    out
  }

  /** Add `w` occurrences of `t`, shrinking back to `capacity` entries
    * with the subtract-(capacity+1)-th-largest rule on overflow.
    */
  def offer(t: String, w: Long): Unit = {
    val cur = counts.getOrDefault(t, 0L)
    counts.put(t, cur + w)
    if (cur == 0L && counts.size > capacity) shrink()
  }

  def mergeIn(b: MGBuffer): Unit = {
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counts.size > capacity) shrink()
  }

  /** Subtract the (capacity+1)-th largest counter from every entry and
    * drop non-positives — the merge rule that keeps the error bound
    * additive across arbitrary merge trees.
    */
  private def shrink(): Unit = {
    val vals = new Array[Long](counts.size)
    var i = 0
    val vit = counts.values().iterator()
    while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(vals)
    // (capacity+1)-th largest = index size-capacity-1 ascending
    val dec = vals(vals.length - capacity - 1)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - dec
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }
}

object FreqSketch {
  /** misra_gries(term, capacity): array<struct<term,est>> est-desc. */
  def misraGries(term: Column, capacity: Int): Column =
    column(MisraGries(expression(term), capacity).toAggregateExpression())
}
