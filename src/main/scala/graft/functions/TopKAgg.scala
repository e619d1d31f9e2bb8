package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Distributed top-k as a `TypedImperativeAggregate`: each task keeps a
  * bounded buffer of the k best (score, payload) pairs, partial buffers
  * merge associatively, and only O(k × partitions) values ever cross the
  * wire — the way per-group top-k must work at 100 TB (a window
  * row_number ≤ k instead shuffles EVERY row of every group before
  * discarding all but k).
  *
  * Payload and score are primitive (long payload ranked by double score,
  * ties by smaller payload) which keeps the buffer allocation-free and
  * the serialized form a flat ByteBuffer.
  */
case class TopKByScore(
    payload: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0 && k <= 1024, "k out of range")

  override def children: Seq[Expression] = Seq(payload, score)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(StructType(Seq(
      StructField("payload", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val p = payload.eval(input)
    val s = score.eval(input)
    if (p != null && s != null)
      buf.insert(p.asInstanceOf[Long], s.asInstanceOf[Double])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.payloads(i), b.scores(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (p, s) =>
      InternalRow(p, s)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.payloads(i)); bb.putDouble(buf.scores(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(payload = cs(0), score = cs(1))
}

/** Bounded buffer: flat parallel arrays, replace-min on overflow.
  * Ordering: higher score wins; equal scores → smaller payload wins
  * (deterministic across partitionings).
  */
final class TopKBuffer(val k: Int) {
  val payloads = new Array[Long](k)
  val scores = new Array[Double](k)
  var size = 0

  private def better(s1: Double, p1: Long, s2: Double, p2: Long): Boolean =
    s1 > s2 || (s1 == s2 && p1 < p2)

  def insert(p: Long, s: Double): Unit = {
    if (size < k) {
      payloads(size) = p; scores(size) = s; size += 1
    } else {
      // find current worst
      var worst = 0
      var i = 1
      while (i < size) {
        if (better(scores(worst), payloads(worst), scores(i), payloads(i))) worst = i
        i += 1
      }
      if (better(s, p, scores(worst), payloads(worst))) {
        payloads(worst) = p; scores(worst) = s
      }
    }
  }

  def sortedDesc: Array[(Long, Double)] =
    (0 until size).map(i => (payloads(i), scores(i))).toArray
      .sortWith((a, b) => better(a._2, a._1, b._2, b._1))
}

object TopKAgg {
  /** top_k(payload, score, k): array<struct<payload,score>> descending. */
  def topK(payload: Column, score: Column, k: Int): Column =
    column(TopKByScore(expression(payload), expression(score), k)
      .toAggregateExpression())
}
