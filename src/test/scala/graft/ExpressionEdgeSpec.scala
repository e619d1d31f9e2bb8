package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HashOps, VectorOps}

/** Boundary behavior of the native expressions: empty inputs, unicode,
  * zero vectors, nulls — the inputs a 100 TB corpus WILL contain.
  */
class ExpressionEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("word shingles: short, empty, unicode, and multi-space inputs") {
    val df = Seq(
      (1L, ""), (2L, "one"), (3L, "one two"), (4L, "one two three"),
      (5L, "héllo wörld ünïcode test"), (6L, "a  b\t c \n d e")
    ).toDF("id", "text")
      .select(col("id"), HashOps.wordShingles(col("text"), 3).as("sh"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L).isEmpty && got(2L).isEmpty && got(3L).isEmpty)
    assert(got(4L) == Seq("one two three"))
    assert(got(5L) == Seq("héllo wörld ünïcode", "wörld ünïcode test"))
    assert(got(6L).length == 3) // whitespace runs collapse like \s+
  }

  test("phash: perceptual stability under small edits, empty blob is 0") {
    import graft.functions.Phash64
    // a long structured "plane": the hash must survive a one-char local
    // edit (the near-dup property) yet separate structurally different
    // content (different byte pattern, not just different text)
    val base = (0 until 400).map(i => s"tok${i % 37}").mkString(" ")
    val edited = base.updated(base.length / 2, 'X')
    val other = (0 until 400).map(i => s"w${(i * i) % 91}x").mkString(" ")
    val hBase = Phash64.hash(base.getBytes("UTF-8"))
    val hEdit = Phash64.hash(edited.getBytes("UTF-8"))
    val hOther = Phash64.hash(other.getBytes("UTF-8"))
    assert(java.lang.Long.bitCount(hBase ^ hEdit) <= 3,
      s"one-char edit moved ${java.lang.Long.bitCount(hBase ^ hEdit)} bits")
    assert(java.lang.Long.bitCount(hBase ^ hOther) > 10,
      "structurally different content collided too closely")
    assert(Phash64.hash(Array.emptyByteArray) == 0L)
    // null propagates through the expression, not NPEs
    val df = Seq((1L, Some("abc def")), (2L, None: Option[String]))
      .toDF("id", "text")
      .select(col("id"), HashOps.phash(col("text").cast("binary")).as("h"))
    val got = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).isDefined && got(2L).isEmpty)
  }

  test("cosine: zero vector yields 0.0, not NaN; null propagates") {
    val df = Seq(
      (1L, Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      (2L, Array(1f, 0f, 0f), Array(1f, 0f, 0f))
    ).toDF("id", "a", "b")
      .select(col("id"), VectorOps.cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(math.abs(got(2L) - 1.0) < 1e-15)
    val withNull = Seq((1L, null.asInstanceOf[Array[Float]], Array(1f)))
      .toDF("id", "a", "b")
      .select(VectorOps.cosine(col("a"), col("b")).as("c"))
    assert(withNull.head.isNullAt(0))
  }

  test("minhash/simhash: empty token arrays are stable, not crashes") {
    val df = Seq((1L, Array.empty[String]), (2L, Array("x", "y")))
      .toDF("id", "toks")
      .select(col("id"),
        HashOps.minhash(col("toks"), 8).as("mh"),
        HashOps.simhash(col("toks")).as("sh"))
    val rows = df.collect()
    assert(rows.length == 2)
    // empty doc: all-maxed minhash signature and simhash 0
    val empty = rows.find(_.getLong(0) == 1L).get
    assert(empty.getSeq[Long](1).forall(_ == Long.MaxValue))
    assert(empty.getLong(2) == 0L)
  }

  test("winnow fingerprint: shorter than k yields empty set") {
    val df = Seq((1L, "tiny"), (2L, "long enough text for fingerprints"))
      .toDF("id", "text")
      .select(col("id"), HashOps.fingerprint(col("text")).as("fp"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).nonEmpty)
    assert(got(2L) == got(2L).sorted, "fingerprints emitted sorted")
  }

  test("topk aggregate: k larger than the group is the whole group") {
    val df = Seq((1L, 1.0), (2L, 3.0), (3L, 2.0)).toDF("id", "score")
      .agg(graft.functions.TopKAgg.topK(col("id"), col("score"), 10).as("top"))
    val top = df.head.getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(_.getLong(0)) == Seq(2L, 3L, 1L))
  }
}
