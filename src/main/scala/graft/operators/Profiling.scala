package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Data-quality operators (SURVEY §2 D37/C64): the profiling pass every
  * ingest pipeline runs on a new source, and trailing-window anomaly
  * detection over the event stream's hourly volumes.
  */
object Profiling {

  val defs: Map[String, QueryDef] = Map(

    // D37 — table profiling: per-column null count, distinct count,
    // min/max (stringified so heterogeneous columns stack). ONE scan:
    // all per-column aggregates run in a single aggregation (Spark
    // computes them columnar in one pass), then the 1×N row unpivots
    // driver-side-free via stack. distinct counts are exact here;
    // at 100 TB swap count_distinct for approx_count_distinct — the
    // plan shape is identical.
    "profile_table" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select("event_id", "user_id", "event_type", "value")
        val cols = Seq("event_id", "user_id", "event_type", "value")
        val aggs = cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
            countDistinct(col(c)).as(s"${c}_distinct"),
            min(col(c)).cast("string").as(s"${c}_min"),
            max(col(c)).cast("string").as(s"${c}_max"))
        }
        val one = ev.agg(aggs.head, aggs.tail: _*)
        val stackExpr = cols.map(c =>
          s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max")
          .mkString(s"stack(${cols.size}, ", ", ",
            ") AS (column_name, n_nulls, n_distinct, min_s, max_s)")
        one.selectExpr(stackExpr).orderBy("column_name")
      },
      """WITH p AS (
           SELECT * FROM (VALUES
             ('event_id',
              (SELECT count(*) FROM events WHERE event_id IS NULL),
              (SELECT count(DISTINCT event_id) FROM events),
              (SELECT CAST(min(event_id) AS VARCHAR) FROM events),
              (SELECT CAST(max(event_id) AS VARCHAR) FROM events)),
             ('user_id',
              (SELECT count(*) FROM events WHERE user_id IS NULL),
              (SELECT count(DISTINCT user_id) FROM events),
              (SELECT CAST(min(user_id) AS VARCHAR) FROM events),
              (SELECT CAST(max(user_id) AS VARCHAR) FROM events)),
             ('event_type',
              (SELECT count(*) FROM events WHERE event_type IS NULL),
              (SELECT count(DISTINCT event_type) FROM events),
              (SELECT min(event_type) FROM events),
              (SELECT max(event_type) FROM events)),
             ('value',
              (SELECT count(*) FROM events WHERE value IS NULL),
              (SELECT count(DISTINCT value) FROM events),
              (SELECT CAST(min(value) AS VARCHAR) FROM events),
              (SELECT CAST(max(value) AS VARCHAR) FROM events))
           ) AS v(column_name, n_nulls, n_distinct, min_s, max_s))
         SELECT column_name, CAST(n_nulls AS BIGINT) AS n_nulls,
                CAST(n_distinct AS BIGINT) AS n_distinct, min_s, max_s
         FROM p ORDER BY column_name"""),

    // C64 — trailing-window anomaly detection: hourly event volume
    // flagged when it deviates > 2σ from the trailing-24-hour mean.
    // The window is keyless over TIME — but its input is the hourly
    // AGGREGATE (24 rows per day per type), not the raw stream, so the
    // single-partition window runs over thousands of rows at any
    // corpus size once partitioned by event_type. Rounded z-scores
    // keep the flag's comparison engine-stable.
    "anomaly_hours" -> QueryDef(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(-24, -1)
        hourly
          .withColumn("mu", avg(col("n")).over(w))
          .withColumn("sd", stddev_samp(col("n")).over(w))
          .withColumn("z",
            round((col("n") - col("mu")) / col("sd"), 4))
          .filter(col("sd").isNotNull && col("sd") > 0 &&
            abs(col("z")) > 2)
          .select(col("hour"), col("event_type"), col("n"), col("z"))
          .orderBy("hour", "event_type")
      },
      """WITH hourly AS (
           SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                  event_type, count(*) AS n
           FROM events GROUP BY 1, 2),
         scored AS (
           SELECT hour, event_type, n,
                  avg(n) OVER w AS mu,
                  stddev_samp(n) OVER w AS sd
           FROM hourly
           WINDOW w AS (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         SELECT hour, event_type, CAST(n AS BIGINT) AS n,
                round((n - mu) / sd, 4) AS z
         FROM scored
         WHERE sd IS NOT NULL AND sd > 0
           AND abs(round((n - mu) / sd, 4)) > 2
         ORDER BY hour, event_type"""),

    // C65 — sliding (hopping) window aggregation: 2-hour windows every
    // 30 minutes via the built-in `window(ts, size, slide)`, the batch
    // twin of the streaming hopping window. Each event lands in exactly
    // size/slide = 4 windows — a constant fan-out before the window-key
    // shuffle, NOT an inequality join (which would plan a
    // BroadcastNestedLoop and die at scale). The oracle replays Spark's
    // epoch-aligned window assignment with integer microsecond
    // arithmetic (window starts are the 4 slide multiples ≤ ts).
    "sliding_hourly" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "2 hours", "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
            round(sum("value"), 4).as("sum_value"))
          .select(col("window.start").as("window_start"),
            col("n_events"), col("sum_value"))
          .orderBy("window_start"),
      """WITH e AS (SELECT epoch_us(ts) AS eu, value FROM events),
         w AS (SELECT make_timestamp(
                        (eu // 1800000000 - k) * 1800000000) AS window_start,
                      value
               FROM e CROSS JOIN range(4) r(k))
         SELECT window_start, count(*) AS n_events,
                round(sum(value), 4) AS sum_value
         FROM w GROUP BY 1 ORDER BY 1"""),

    // C66 — time-series gap filling: the dense (hour × event_type) grid
    // with zero rows for silent hours — what every downstream
    // anomaly/trend consumer (C64) actually needs as input. The grid is
    // generated from a 1-row span aggregate × the distinct-type dim via
    // `sequence(h0, h1, interval 1 hour)` — grid size is
    // hours·|types|, independent of event volume, and the left join
    // runs against the already-aggregated hourly counts (same
    // cardinality), so the fill step never touches raw-event scale.
    "gap_fill_hours" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(date_trunc("hour", col("ts")).as("hour"),
            col("event_type"))
        val hourly = ev.groupBy("hour", "event_type")
          .agg(count(lit(1)).as("n_raw"))
        val span = ev.agg(min("hour").as("h0"), max("hour").as("h1"))
        val types = ev.select("event_type").distinct()
        val grid = span.crossJoin(types)
          .select(explode(expr("sequence(h0, h1, interval 1 hour)"))
            .as("hour"), col("event_type"))
        grid.join(hourly, Seq("hour", "event_type"), "left")
          .select(col("hour"), col("event_type"),
            coalesce(col("n_raw"), lit(0L)).as("n"))
          .orderBy("hour", "event_type")
      },
      """WITH ev AS (
           SELECT date_trunc('hour', ts) AS hour, event_type FROM events),
         hourly AS (
           SELECT hour, event_type, count(*) AS n_raw
           FROM ev GROUP BY 1, 2),
         span AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM ev),
         types AS (SELECT DISTINCT event_type FROM ev),
         grid AS (
           SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour,
                  event_type
           FROM span, types)
         SELECT g.hour, g.event_type, COALESCE(h.n_raw, 0) AS n
         FROM grid g
         LEFT JOIN hourly h
           ON g.hour = h.hour AND g.event_type = h.event_type
         ORDER BY g.hour, g.event_type"""),

    // C75 — referential-integrity audit: orphan counts along every FK
    // edge of the star schema in one row — the pre-flight data-quality
    // gate before any join-heavy pipeline run (a nonzero orphan count
    // means inner joins silently drop rows). Each count is a left-anti
    // join shuffled on its key; the dimension sides (customer, nation)
    // broadcast. Distinct keys are collapsed BEFORE the anti joins
    // where only existence matters, so the probe side is key-bounded.
    "fk_audit" -> QueryDef(
      (s, d) => {
        def orphans(left: org.apache.spark.sql.DataFrame, lk: String,
            right: org.apache.spark.sql.DataFrame, rk: String, as: String) =
          left.join(right, col(lk) === col(rk), "left_anti")
            .agg(count(lit(1)).as(as))
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val li = orphans(Tables.lineitem(s, d).select("l_orderkey"),
          "l_orderkey", o.select("o_orderkey"), "o_orderkey",
          "lineitem_orphans")
        val oc = orphans(o.select("o_custkey"), "o_custkey",
          c.select("c_custkey"), "c_custkey", "order_orphans")
        val cn = orphans(c.select("c_nationkey"), "c_nationkey",
          Tables.nation(s, d).select("n_nationkey"), "n_nationkey",
          "customer_orphans")
        val eu = orphans(
          Tables.events(s, d).select("user_id").distinct(), "user_id",
          c.select("c_custkey"), "c_custkey", "event_user_orphans")
        li.crossJoin(oc).crossJoin(cn).crossJoin(eu)
      },
      """SELECT
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
             AS lineitem_orphans,
           (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
             AS order_orphans,
           (SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey))
             AS customer_orphans,
           (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events) e
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = e.user_id))
             AS event_user_orphans"""),

    // C78 — two-sample Kolmogorov–Smirnov drift statistic between two
    // providers' document-length distributions — the distribution-drift
    // alarm run between corpus snapshots or sources. Exact, not
    // sampled: per distinct value, cumulative counts for both samples
    // come from one conditional aggregate + ONE distributed ranged
    // prefix-sum pass over the per-value rows (the input is value-
    // cardinality-bounded already, but the ranged formulation keeps
    // even a 10⁹-distinct-value domain off a single-reducer window),
    // and the KS max is over exact-integer ratios — deterministic
    // across engines.
    "ks_drift" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(col("source").isin("src0", "src1"))
          .select(col("source"), col("n_chars"))
        val perVal = docs.groupBy("n_chars")
          .agg(count(when(col("source") === "src0", 1)).as("c0"),
            count(when(col("source") === "src1", 1)).as("c1"))
        val withCum = graft.operators.Packing.withGlobalPrefixSums(
          perVal, Seq("n_chars"), Seq("c0", "c1"))
          .withColumn("cum0", col("prefix_c0") + col("c0"))
          .withColumn("cum1", col("prefix_c1") + col("c1"))
        val tot = withCum.agg(max("cum0").as("n0"), max("cum1").as("n1"))
        withCum.crossJoin(broadcast(tot))
          .agg(first("n0").as("n0"), first("n1").as("n1"),
            round(max(abs(col("cum0").cast("double") / col("n0")
              - col("cum1").cast("double") / col("n1"))), 6).as("ks_stat"))
      },
      """WITH vals AS (
           SELECT source, n_chars FROM documents
           WHERE source IN ('src0', 'src1')),
         per_val AS (
           SELECT n_chars,
                  count(CASE WHEN source = 'src0' THEN 1 END) AS c0,
                  count(CASE WHEN source = 'src1' THEN 1 END) AS c1
           FROM vals GROUP BY n_chars),
         cum AS (
           SELECT n_chars,
                  sum(c0) OVER (ORDER BY n_chars) AS cum0,
                  sum(c1) OVER (ORDER BY n_chars) AS cum1
           FROM per_val),
         tot AS (SELECT max(cum0) AS n0, max(cum1) AS n1 FROM cum)
         SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
                round(max(abs(CAST(cum0 AS DOUBLE) / n0
                              - CAST(cum1 AS DOUBLE) / n1)), 6) AS ks_stat
         FROM cum, tot GROUP BY n0, n1"""))
}
