package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Relational-engine completeness catalog (SURVEY §2 C-series).
  *
  * Each operator is declared with the DataFrame API so Catalyst plans it:
  * filters/projections push to the parquet scan, aggregations run
  * partial-then-final, dimension joins broadcast, top-k plans as
  * TakeOrderedAndProject (no global sort). Doubles in results are rounded
  * to 4 dp on BOTH engines so cross-engine hashes are stable.
  */
object Relational {

  val defs: Map[String, QueryDef] = Map(

    // C1 — multi-aggregate group-by, TPC-H Q1 style: partial agg map-side,
    // one shuffle on the (tiny) group key. MONEY SUMS ARE EXACT DECIMALS
    // (round-9 sf10 finding): prices/discounts are 2 dp values, and a
    // double sum over 60M rows differs between engines in its last bits
    // because the partial-agg tree and a sequential scan add in different
    // orders (measured at sf10: ...372.9941 vs ...372.9982). Casting each
    // operand to its true decimal scale first makes the sum exact and
    // order-independent; ONE cast to double at the end is then
    // correctly-rounded identically on both engines. Small-magnitude
    // averages keep the double path (their 4 dp rounding absorbs tails).
    "q1_agg" -> QueryDef(
      (s, d) => {
        val cp = Tables.cents(col("l_extendedprice"))
        val cd = Tables.cents(col("l_discount"))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 4).as("sum_qty"),
            (sum(cp).cast("double") / 100.0).as("sum_base_price"),
            (sum(cp * (lit(100L) - cd)).cast("double") / 10000.0)
              .as("sum_disc_price"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 4) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                     AS DOUBLE) / 100.0 AS sum_base_price,
                CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                     AS DOUBLE) / 10000.0 AS sum_disc_price,
                round(avg(l_quantity), 4) AS avg_qty,
                round(avg(l_discount), 4) AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""),

    // C2 — selective filter + scalar agg, TPC-H Q6 style. The three
    // predicates all push to the parquet scan (PushedFilters). Revenue
    // is an exact decimal sum (see q1_agg).
    "q6_filter" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
          .agg((sum(Tables.cents(col("l_extendedprice"))
              * Tables.cents(col("l_discount")))
            .cast("double") / 10000.0).as("revenue")),
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                          * CAST(round(l_discount * 100, 0) AS BIGINT))
                     AS DOUBLE) / 10000.0 AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.03 AND 0.07
           AND l_quantity < 24"""),

    // C3 — top-k: orderBy+limit plans as TakeOrderedAndProject — each
    // partition keeps k rows, only k×partitions reach the driver. No
    // global sort at 100 TB.
    "topk_orders" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100),
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),

    // C4 — window functions: rank + running sum per customer. One shuffle
    // on the partition key; window evaluated sorted-within-partition.
    "window_running" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, d)
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
          .withColumn("order_rank", row_number().over(w))
          .withColumn("running_spend",
            round(sum("o_totalprice")
              .over(w.rowsBetween(Window.unboundedPreceding, 0)), 4))
          .select("o_custkey", "o_orderkey", "order_rank", "running_spend")
          .orderBy("o_custkey", "order_rank")
      },
      """SELECT o_custkey, o_orderkey,
                row_number() OVER w AS order_rank,
                round(sum(o_totalprice) OVER
                  (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                  AS running_spend
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, order_rank"""),

    // C5 — left-semi join (EXISTS): customers with at least one high-value
    // order. Semi joins never duplicate or widen rows — right side only
    // gates.
    "semi_join" -> QueryDef(
      (s, d) =>
        Tables.customer(s, d).select("c_custkey", "c_name")
          .join(Tables.orders(s, d).filter(col("o_totalprice") > 200000)
            .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .orderBy("c_custkey"),
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 200000)
         ORDER BY c_custkey"""),

    // C6 — left-anti join (NOT EXISTS): parts never shipped in bulk
    // (selective right side keeps the result non-trivial at every sf).
    "anti_join" -> QueryDef(
      (s, d) =>
        Tables.part(s, d).select("p_partkey", "p_name")
          .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
            .select("l_partkey"),
            col("p_partkey") === col("l_partkey"), "left_anti")
          .orderBy("p_partkey"),
      """SELECT p_partkey, p_name FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_partkey = p_partkey AND l_quantity >= 45)
         ORDER BY p_partkey"""),

    // C7 — left outer join + null handling: per-customer order count
    // including order-less customers.
    "outer_join" -> QueryDef(
      (s, d) =>
        Tables.customer(s, d).select("c_custkey", "c_name")
          .join(Tables.orders(s, d).select("o_custkey", "o_orderkey"),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey", "c_name")
          .agg(count("o_orderkey").as("n_orders"))
          .orderBy("c_custkey"),
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey"""),

    // C8 — distinct: dropDuplicates = hash aggregate, partial-then-final.
    "distinct_segments" -> QueryDef(
      (s, d) =>
        Tables.customer(s, d).select("c_mktsegment").distinct()
          .orderBy("c_mktsegment"),
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"),

    // C9 — rollup: hierarchical subtotals (status, (status, priority),
    // grand total) in one pass.
    "rollup_sales" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .rollup("o_orderstatus", "o_orderpriority")
          // exact long-cents money sum (q1_agg discipline)
          .agg((sum(Tables.cents(col("o_totalprice")))
            .cast("double") / 100.0).as("total"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      """SELECT o_orderstatus, o_orderpriority,
                CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     AS DOUBLE) / 100.0 AS total,
                count(*) AS n
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST"""),

    // C10 — manual pivot via conditional aggregation (ANSI-portable, and
    // exactly what Spark's pivot() lowers to).
    "pivot_status" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(
            count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
            count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
            count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
                count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
                count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
                count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // C11 — union + distinct set-op across two key domains.
    "union_keys" -> QueryDef(
      (s, d) =>
        Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
          .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
          .distinct()
          .orderBy("nationkey"),
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey FROM supplier)
         ORDER BY nationkey"""),

    // C12 — time-bucketed aggregation (the batch analog of a tumbling
    // window; Firehose buffers into time buckets the same way).
    "events_hourly" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            round(sum("value"), 4).as("total_value"))
          .orderBy("hour", "event_type"),
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                count(*) AS n_events, round(sum(value), 4) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""))
}
