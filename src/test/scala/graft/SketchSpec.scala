package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{FreqSketch, MGBuffer}

/** Misra-Gries heavy-hitters sketch: the error bound and the
  * survives-any-merge-tree guarantee the two-pass `heavy_hitters`
  * catalog entry relies on.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MG buffer: estimates undercount by at most N/(capacity+1)") {
    val k = 8
    val buf = new MGBuffer(k)
    // zipf-ish stream: term i appears 1000/i times, i = 1..50
    val truth = (1 to 50).map(i => s"t$i" -> (1000 / i).toLong).toMap
    val n = truth.values.sum
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(
      truth.toSeq.flatMap { case (t, c) => Seq.fill(c.toInt)(t) })
    stream.foreach(t => buf.offer(t, 1L))
    val est = buf.entries.toMap
    est.foreach { case (t, e) =>
      assert(e <= truth(t), s"$t overestimated")
      assert(truth(t) - e <= n / (k + 1), s"$t error bound violated")
    }
    assert(est.size <= k)
  }

  test("planted hot term survives a many-way partitioned merge") {
    val k = 16
    // 64 "partitions": each holds distinct background terms (vocab blows
    // the capacity everywhere) plus the hot term at ~10% frequency —
    // below every per-partition majority, so only the MERGE guarantee
    // can keep it alive.
    val parts = (0 until 64).map { p =>
      val b = new MGBuffer(k)
      (0 until 90).foreach(i => b.offer(s"bg_${p}_$i", 1L))
      (0 until 10).foreach(_ => b.offer("HOT", 1L))
      b
    }
    val merged = parts.reduce { (a, b) => a.mergeIn(b); a }
    val n = 64L * 100L
    val est = merged.entries.toMap
    // true count 640 = n/10 > n/(k+1) = 376 → must be present
    assert(est.contains("HOT"), "hot term evicted by merge")
    assert(est("HOT") <= 640L && 640L - est("HOT") <= n / (k + 1))
  }

  test("sketch aggregate over a DataFrame finds every θ-heavy term") {
    // 10k rows over 600 distinct terms; terms h0..h4 each ~8% of mass
    val rows = (0 until 10000).map { i =>
      if (i % 100 < 40) s"h${i % 5}" else s"cold_${i % 600}"
    }
    val df = rows.toDF("term")
    val out = df
      .agg(FreqSketch.misraGries(col("term"), 64).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect()
    val got = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (0 until 5).foreach { h =>
      val t = s"h$h"
      assert(got.contains(t), s"$t missing from sketch")
      assert(got(t) <= exact(t) &&
        exact(t) - got(t) <= rows.size.toLong / 65)
    }
  }
}
