package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cleaning
import graft.dedup.Clusters

/** Planted-data semantics for winsorization, windowed event dedup, and
  * fixed-iteration PageRank: exact clamp bounds, bucket boundaries, and
  * rank-mass conservation the sf oracles can't isolate.
  */
class CleaningGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("winsorize clamps into the exact interpolated percentile band") {
    import spark.implicits._
    // sorted: [0, 1×10, 100] → p05 at idx 0.55 → 0.55; p95 at idx
    // 10.45 → 1 + 0.45·99 = 45.55
    val df = (Seq(0.0, 100.0) ++ Seq.fill(10)(1.0)).map(("g", _))
      .toDF("grp", "v")
    val r = Cleaning.winsorize(df, "grp", "v", 0.05, 0.95)
      .agg(min("_clipped"), max("_clipped")).head
    assert(math.abs(r.getDouble(0) - 0.55) < 1e-9)
    assert(math.abs(r.getDouble(1) - 45.55) < 1e-9)
  }

  test("windowed dedup keeps one event per key per 10-minute bucket") {
    import spark.implicits._
    val ev = Seq(
      // same user/type, 09:00 and 09:05 — same 600 s bucket → keep 1st
      (10L, 1L, "click", Timestamp.valueOf("2024-01-01 09:00:30")),
      (11L, 1L, "click", Timestamp.valueOf("2024-01-01 09:05:00")),
      // 09:10:01 crosses the bucket boundary → kept
      (12L, 1L, "click", Timestamp.valueOf("2024-01-01 09:10:01")),
      // different type in the first bucket → kept
      (13L, 1L, "view", Timestamp.valueOf("2024-01-01 09:01:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    import org.apache.spark.sql.expressions.Window
    val bucket = floor(col("ts").cast("long") / 600)
    val w = Window.partitionBy(col("user_id"), col("event_type"), bucket)
      .orderBy(col("event_id"))
    val kept = ev.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(10L, 12L, 13L))
  }

  test("pagerank conserves mass and ranks the path center highest") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Clusters.pageRank(edges, iters = 20, damping = 0.85)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // no dangling-node leak
    assert(r(2L) > r(1L) && math.abs(r(1L) - r(3L)) < 1e-12)
  }
}
