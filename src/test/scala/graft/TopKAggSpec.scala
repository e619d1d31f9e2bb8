package graft

import org.apache.spark.sql.GraftSqlBridge.expression
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BottomKBuffer, BottomKByLongKey, TopKAgg,
  TopKFreshBuffer, TopKFreshByScore, TopKBuffer}

/** Unit + end-to-end specs for the bounded-heap
  * TypedImperativeAggregates behind NN-descent's round merge (round-11
  * advice item 2: the exact-equivalence claim vs the old row_number
  * windows previously rested solely on the offline whole-graph-hash
  * artifact — serialize round-trips, cross-partition dedup, and
  * tie-breaking had no in-repo guard).
  */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- buffer-level units -------------------------------------------

  test("TopKBuffer keeps the k best by (score desc, payload asc)") {
    val b = new TopKBuffer(3)
    Seq((1L, 0.5), (2L, 0.9), (3L, 0.1), (4L, 0.7), (5L, 0.9))
      .foreach { case (p, s) => b.insert(p, s) }
    // ties at 0.9: payload 2 beats payload 5; 0.1 evicted
    assert(b.sortedDesc.toSeq == Seq((2L, 0.9), (5L, 0.9), (4L, 0.7)))
  }

  test("TopKFreshBuffer ANDs fresh across duplicate copies, keeps one") {
    val b = new TopKFreshBuffer(4)
    b.insert(7L, 0.8, true)
    b.insert(7L, 0.8, false) // re-discovery: fresh collapses to false
    b.insert(8L, 0.6, true)
    b.insert(8L, 0.6, true) // duplicate with same flag: no change
    assert(b.sortedDesc.toSeq == Seq((7L, 0.8, false), (8L, 0.6, true)))
  }

  test("TopKFreshBuffer rejects a contract-violating duplicate score") {
    val b = new TopKFreshBuffer(4)
    b.insert(7L, 0.8, true)
    val ex = intercept[IllegalStateException](b.insert(7L, 0.81, true))
    assert(ex.getMessage.contains("contract violation"))
  }

  test("TopKFreshBuffer eviction respects (score desc, payload asc)") {
    val b = new TopKFreshBuffer(2)
    b.insert(1L, 0.5, true)
    b.insert(2L, 0.5, true) // tie: payload 1 beats 2
    b.insert(3L, 0.5, true) // loses the tie to both — not inserted
    assert(b.sortedDesc.toSeq == Seq((1L, 0.5, true), (2L, 0.5, true)))
    b.insert(4L, 0.9, false) // evicts payload 2 (the worst)
    assert(b.sortedDesc.toSeq == Seq((4L, 0.9, false), (1L, 0.5, true)))
  }

  test("BottomKBuffer keeps the k smallest (key asc, payload asc)") {
    val b = new BottomKBuffer(2)
    Seq((10L, 5L), (11L, 1L), (12L, 5L), (13L, 0L))
      .foreach { case (p, k) => b.insert(p, k) }
    // keys 0 and 1 win; key-5 ties never reached
    assert(b.sortedAsc.toSeq == Seq(13L, 11L))
  }

  test("BottomKBuffer is exact above 2^53 (the reason it's long-keyed)") {
    val b = new BottomKBuffer(1)
    val base = (1L << 60)
    b.insert(1L, base + 1L)
    b.insert(2L, base) // differs only below double precision
    assert(b.sortedAsc.toSeq == Seq(2L))
  }

  test("TopKBuffer heap matches the full-sort reference at k=1024") {
    // round-12 verdict item 5: the lazy worst-at-root heap must select
    // the IDENTICAL set as a full sort at the k the old replace-min
    // scan degraded at, across the fill→heapify transition and dense
    // score ties (score quantized to 997 levels forces tie-breaking
    // through the payload order)
    val k = 1024
    val rnd = new scala.util.Random(20260816L)
    val b = new TopKBuffer(k)
    val all = (0 until 50000).map { _ =>
      (rnd.nextLong(), rnd.nextInt(997) / 996.0)
    }
    all.foreach { case (p, s) => b.insert(p, s) }
    val expect = all
      .sortWith((x, y) => x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
      .take(k)
    assert(b.sortedDesc.toSeq == expect)
  }

  test("BottomKBuffer heap matches the full-sort reference at k=1024") {
    val k = 1024
    val rnd = new scala.util.Random(8102602L)
    val b = new BottomKBuffer(k)
    val all = (0 until 50000).map { i => (i.toLong, rnd.nextLong() >>> 16) }
    all.foreach { case (p, kk) => b.insert(p, kk) }
    val expect = all
      .sortWith((x, y) => x._2 < y._2 || (x._2 == y._2 && x._1 < y._1))
      .take(k).map(_._1)
    assert(b.sortedAsc.toSeq == expect)
  }

  test("TopKFreshBuffer heap+fast-reject matches the dedup-sort reference") {
    // dup-heavy contract-honoring stream (payload determines score, so
    // duplicates always carry identical scores): the kept set must be
    // the deduped top-k by (score desc, payload asc) with AND'd flags,
    // for sizes spanning the fill→heapify transition and k=1024
    for (k <- Seq(3, 48, 1024)) {
      val rnd = new scala.util.Random(k * 7919L)
      val b = new TopKFreshBuffer(k)
      val n = 30000
      val stream = (0 until n).map { _ =>
        val p = rnd.nextInt(2000).toLong // dense payload collisions
        (p, ((p * 2654435761L) % 9973L).toDouble / 9973.0, rnd.nextBoolean())
      }
      stream.foreach { case (p, s, f) => b.insert(p, s, f) }
      val expect = stream.groupBy(_._1).map { case (p, es) =>
        (p, es.head._2, es.forall(_._3))
      }.toSeq.sortBy(e => (-e._2, e._1)).take(k)
      assert(b.sortedDesc.toSeq == expect)
    }
  }

  // ---- serialize/deserialize round-trips ----------------------------

  test("TopKFreshByScore serialize/deserialize round-trips a full buffer") {
    val agg = TopKFreshByScore(expression(lit(0L)), expression(lit(0.0)),
      expression(lit(true)), 5)
    val b = new TopKFreshBuffer(5)
    Seq((1L, 0.9, true), (2L, 0.8, false), (3L, 0.7, true),
      (4L, 0.6, false), (5L, 0.5, true))
      .foreach { case (p, s, f) => b.insert(p, s, f) }
    val back = agg.deserialize(agg.serialize(b))
    assert(back.sortedDesc.toSeq == b.sortedDesc.toSeq)
    // merging the round-trip into a live buffer ANDs flags, not dupes
    val live = new TopKFreshBuffer(5)
    live.insert(1L, 0.9, false)
    val merged = agg.merge(live, back)
    assert(merged.sortedDesc.head == ((1L, 0.9, false)))
    assert(merged.size == 5)
  }

  test("BottomKByLongKey serialize/deserialize round-trips a full buffer") {
    val agg = BottomKByLongKey(expression(lit(0L)), expression(lit(0L)), 3)
    val b = new BottomKBuffer(3)
    Seq((1L, 30L), (2L, 10L), (3L, 20L))
      .foreach { case (p, k) => b.insert(p, k) }
    val back = agg.deserialize(agg.serialize(b))
    assert(back.sortedAsc.toSeq == Seq(2L, 3L, 1L))
  }

  // ---- end-to-end: duplicate payloads split across partitions -------

  test("topKFresh over partition-split duplicates matches the window twin") {
    import spark.implicits._
    // groups of (grp, payload, score, fresh): payload 100 appears in
    // BOTH halves of the input with fresh=true and fresh=false — after
    // repartition(8) the copies land in different partitions, so the
    // dedup-AND must survive partial-buffer merges
    val rows = (0 until 50).flatMap { i =>
      val grp = i % 5
      // every row has a fresh=true copy; only i < 10 adds a false
      // re-discovery copy, so the expected output mixes flags
      Seq((grp, 100L + i % 7, (i % 7) / 10.0, true)) ++
        (if (i < 10) Seq((grp, 100L + i % 7, (i % 7) / 10.0, false))
         else Nil)
    }
    val df = rows.toDF("grp", "payload", "score", "fresh").repartition(8)
    val got = df.groupBy("grp")
      .agg(TopKAgg.topKFresh(col("payload"), col("score"),
        col("fresh"), 3).as("top"))
      .select(col("grp"), explode(col("top")).as("e"))
      .select(col("grp"), col("e.payload"), col("e.score"), col("e.fresh"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    // window twin: dedup payloads (fresh = AND), then top-3 by
    // (score desc, payload asc) — the formulation the aggregate replaced
    val twin = rows.groupBy(r => (r._1, r._2)).map { case ((g, p), cs) =>
      (g, p, cs.head._3, cs.forall(_._4))
    }.groupBy(_._1).flatMap { case (_, es) =>
      es.toSeq.sortBy(e => (-e._3, e._2)).take(3)
    }.toSet
    assert(got == twin)
  }

  test("topK and bottomKByKey agree with sort-based twins across partitions") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (i % 4, i.toLong, ((i * 37) % 100) / 100.0, ((i * 2654435761L) ^ i))
    }
    val df = rows.toDF("grp", "payload", "score", "hkey").repartition(7)
    val gotTop = df.groupBy("grp")
      .agg(TopKAgg.topK(col("payload"), col("score"), 5).as("t"))
      .select(col("grp"), explode(col("t")).as("e"))
      .select(col("grp"), col("e.payload")).as[(Int, Long)]
      .collect().toSet
    val twinTop = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (-e._3, e._2)).take(5).map(e => (e._1, e._2))
    }.toSet
    assert(gotTop == twinTop)
    val gotBot = df.groupBy("grp")
      .agg(TopKAgg.bottomKByKey(col("payload"), col("hkey"), 5).as("t"))
      .select(col("grp"), explode(col("t")).as("payload"))
      .as[(Int, Long)].collect().toSet
    val twinBot = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._4, e._2)).take(5).map(e => (e._1, e._2))
    }.toSet
    assert(gotBot == twinBot)
  }
}
