package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Numeric-robustness cleaning passes: outlier winsorization and
  * time-windowed event deduplication — both standard telemetry/feature
  * hygiene steps before a dataset feeds training or analytics.
  */
object Cleaning {

  /** Clamp `valueCol` into its group's [pLo, pHi] exact-percentile band
    * (winsorization). The percentile table is group-count-bounded →
    * always broadcast-safe; the clamp itself is a narrow map.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    val qs = df.groupBy(col(groupCol).as("_g"))
      .agg(expr(s"percentile($valueCol, $pLo)").as("_lo"),
        expr(s"percentile($valueCol, $pHi)").as("_hi"))
    df.join(broadcast(qs), col(groupCol) === col("_g"))
      .withColumn("_clipped",
        greatest(col("_lo"), least(col("_hi"), col(valueCol))))
  }

  val defs: Map[String, QueryDef] = Map(

    // C71 — winsorized aggregation: per-type event values clipped to
    // the exact [p05, p95] band before the mean — the robust-mean any
    // metrics pipeline reports when a corrupt producer can emit a 1e12
    // outlier. Spark `percentile` ≡ DuckDB `quantile_cont` (linear
    // interpolation), clamp and mean re-aggregate in one shuffle.
    "winsorize_values" -> QueryDef(
      (s, d) =>
        winsorize(Tables.events(s, d).select("event_type", "value"),
          "event_type", "value", 0.05, 0.95)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            round(avg("value"), 4).as("mean_raw"),
            round(avg("_clipped"), 4).as("mean_winsorized"),
            round(min("_clipped"), 4).as("lo_bound"),
            round(max("_clipped"), 4).as("hi_bound"))
          .orderBy("event_type"),
      """WITH q AS (
           SELECT event_type AS g,
                  quantile_cont(value, 0.05) AS lo,
                  quantile_cont(value, 0.95) AS hi
           FROM events GROUP BY 1)
         SELECT event_type, count(*) AS n,
                round(avg(value), 4) AS mean_raw,
                round(avg(greatest(lo, least(hi, value))), 4)
                  AS mean_winsorized,
                round(min(greatest(lo, least(hi, value))), 4) AS lo_bound,
                round(max(greatest(lo, least(hi, value))), 4) AS hi_bound
         FROM events JOIN q ON event_type = g
         GROUP BY event_type ORDER BY event_type"""),

    // C72 — windowed event dedup: at-least-once producers re-send the
    // same logical event; keep ONE (user, type) per 10-minute tumbling
    // window — the first-ingested (lowest event_id; ordering on ts
    // would tie-break differently across engines because Spark holds
    // micros where the parquet carries nanos). One shuffle on the
    // dedup key; the window bucket is pure integer arithmetic on the
    // epoch, so the same plan holds on an unbounded stream (bucket =
    // watermark-friendly event-time window).
    "dedup_events_window" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val bucket = floor(col("ts").cast("long") / 600)
        val w = Window.partitionBy(col("user_id"), col("event_type"),
            bucket).orderBy(col("event_id"))
        Tables.events(s, d)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_kept"),
            sum(col("event_id")).as("kept_id_sum"))
          .orderBy("event_type")
      },
      """WITH r AS (
           SELECT event_type, event_id,
                  row_number() OVER (
                    PARTITION BY user_id, event_type,
                                 CAST(floor(epoch(ts) / 600) AS BIGINT)
                    ORDER BY event_id) AS rn
           FROM events)
         SELECT event_type, count(*) AS n_kept,
                CAST(sum(event_id) AS BIGINT) AS kept_id_sum
         FROM r WHERE rn = 1
         GROUP BY event_type ORDER BY event_type""")
  )
}
