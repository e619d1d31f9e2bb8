package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Diagnostics
import graft.text.Vocab

/** Planted-data semantics for the vocabulary-induction and pre-flight
  * diagnostic operators: BPE pair weighting by word frequency, the
  * normalizer's exact output bytes, skew shares, and the self-join
  * cardinality arithmetic.
  */
class VocabDiagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bpe pair counts weight character pairs by word frequency") {
    import spark.implicits._
    // vocabulary: "aab" ×3, "ab" ×1, "x" (too short — contributes no pair)
    val docs = Seq("aab aab x", "aab ab").toDF("text")
    val r = Vocab.bpePairCounts(docs, 10).collect()
      .map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r == Map("aa" -> 3L, "ab" -> 4L))
  }

  test("normalizer strips control chars, collapses runs, trims — exact bytes") {
    import spark.implicits._
    val df = Seq("\t a\r\nb   c d ").toDF("t")
    val out = df.select(Vocab.normalized(org.apache.spark.sql.functions.col("t")))
      .head.getString(0)
    assert(out == "a b c d")
  }

  test("skew report: shares sum the hot key correctly and rank descending") {
    import spark.implicits._
    val df = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val rows = Diagnostics.skewReport(df, "k", 2).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).getLong(1) == 3L)
    assert(math.abs(rows(0).getDouble(2) - 0.6) < 1e-9)
  }

  test("join size probe computes sum and max of per-key squared counts") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b").toDF("k")
    val r = Diagnostics.joinSizeProbe(df, "k").head
    assert(r.getLong(0) == 2L)      // n_keys
    assert(r.getLong(1) == 10L)     // 3² + 1²
    assert(r.getLong(2) == 9L)
    assert(math.abs(r.getDouble(3) - 0.9) < 1e-9)
  }
}
