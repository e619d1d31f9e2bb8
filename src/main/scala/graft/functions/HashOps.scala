package graft.functions

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash-sketch expressions for near-duplicate detection, implemented as
  * Catalyst expressions so the sketch computation happens inside the
  * scan stage (no UDF serialization, no Row boxing). All are
  * `CodegenFallback`: per-row cost is dominated by hashing every
  * shingle/token, so interpreted dispatch overhead is immaterial — the
  * hot loops below are still tight JVM primitives.
  *
  * Algorithms are the standard public constructions:
  *  - MinHash with Carter–Wegman double hashing (Broder 1997),
  *  - SimHash bit-voting (Charikar 2002),
  *  - winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003),
  *  - random-hyperplane LSH (Charikar 2002), planes derived from a
  *    seeded hash so they are deterministic across executors.
  */
object HashOps {

  private[functions] def hashUtf8(s: UTF8String, seed: Int): Int =
    MurmurHash3.bytesHash(s.getBytes, seed)

  /** Deterministic pseudo-random value in [-1, 1) for hyperplane
    * component (plane, dim) — same on every executor, no RNG state.
    */
  private[functions] def planeComponent(plane: Int, dim: Int): Double = {
    val h = MurmurHash3.productHash((plane, dim), 0x5bd1e995)
    (h.toDouble / Int.MaxValue.toDouble)
  }

  def minhash(shingles: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(shingles), numHashes))

  def simhash(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  def fingerprint(text: Column, k: Int = 9, window: Int = 4): Column =
    column(WinnowFingerprint(expression(text), k, window))

  def hyperplaneSig(vec: Column, bits: Int): Column =
    column(HyperplaneSignature(expression(vec), bits))

  def wordShingles(text: Column, k: Int): Column =
    column(WordShingles(expression(text), k))
}

/** array<string> shingles → array<long> of `numHashes` min-hash values.
  * Permutation i is `h1 + i*h2` over two murmur3 seeds (double hashing)
  * — 2 hashes per shingle regardless of signature width.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h1 = HashOps.hashUtf8(s, 0x9747b28c).toLong & 0xffffffffL
        val h2 = (HashOps.hashUtf8(s, 0x85ebca6b).toLong & 0xffffffffL) | 1L
        var i = 0
        while (i < numHashes) {
          val hv = (h1 + i.toLong * h2) & 0x7fffffffffffffffL
          if (hv < mins(i)) mins(i) = hv
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** array<string> tokens → 64-bit simhash (bit-vote over per-token
  * 64-bit hashes built from two murmur3 halves).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h = (HashOps.hashUtf8(s, 0x9747b28c).toLong << 32) |
          (HashOps.hashUtf8(s, 0x85ebca6b).toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** string → array<long> winnowing fingerprints: rolling hash over
  * character k-grams, min of each sliding window of `w` hashes, distinct
  * + sorted. Robust to local edits — two documents sharing runs of ≥
  * k+w-1 chars share fingerprints.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // polynomial hash of every k-gram (n*k ops; k is small)
    val B = 257L
    val M = 0x7fffffffffffffL // 55-bit mask keeps multiplication exact
    val grams = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var g = 0L
      var j = 0
      while (j < k) { g = (g * B + (bytes(i + j) & 0xffL)) & M; j += 1 }
      grams(i) = g
      i += 1
    }
    // winnow: min of each window of w consecutive gram hashes
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    val nw = grams.length - w + 1
    if (nw <= 0) selected += grams.min
    else {
      i = 0
      while (i < nw) {
        var m = Long.MaxValue
        var j = 0
        while (j < w) { if (grams(i + j) < m) m = grams(i + j); j += 1 }
        selected += m
        i += 1
      }
    }
    new GenericArrayData(selected.toArray)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** array<float> → int signature of `bits` sign-bits against
  * deterministic pseudo-random hyperplanes.
  */
case class HyperplaneSignature(child: Expression, bits: Int, dims: Int = 64)
    extends UnaryExpression with CodegenFallback {
  require(bits <= 32)
  override def dataType: DataType = IntegerType

  // materialized once per executor (transient: rebuilt after deserialize)
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(bits, dims)((p, i) => HashOps.planeComponent(p, i))

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dims)
    var sig = 0
    var p = 0
    while (p < bits) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += vec.getFloat(i).toDouble * plane(i)
        i += 1
      }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** string → array<string> of distinct k-word shingles, one pass.
  *
  * Replaces the composed
  * `array_distinct(transform(sequence(...), i -> concat_ws(element_at×k)))`
  * pipeline, which Catalyst inlines into every consumer (filter +
  * project + generate each re-evaluate the whole tree) and which runs
  * through interpreted lambda machinery per element. Semantics match
  * `split(trim(text), "\s+")` + k-gram + distinct exactly (same Java
  * regex), so DuckDB oracles are unaffected.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(v: Any): Any = {
    val toks = ws.split(v.asInstanceOf[UTF8String].toString.trim)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
