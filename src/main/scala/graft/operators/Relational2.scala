package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Second relational batch: statistics, percentiles, cube/grouping,
  * string/date expressions, set ops, scalar subqueries, per-group top-k,
  * deep multi-joins. Everything oracle-checked; doubles rounded at 4 dp.
  */
object Relational2 {

  val defs: Map[String, QueryDef] = Map(

    // Aggregate statistics: stddev/variance/correlation per group.
    "stats_agg" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_cov"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag,
                round(stddev_samp(l_extendedprice), 4) AS sd_price,
                round(var_samp(l_quantity), 4) AS var_qty,
                round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
                round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_cov
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Exact percentiles (linear interpolation both engines).
    "percentiles" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_orderstatus")
          .agg(
            round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
            round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90"),
            round(percentile(col("o_totalprice"), lit(0.99)), 4).as("p99"))
          .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
                round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
                round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
                round(quantile_cont(o_totalprice, 0.99), 4) AS p99
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    // CUBE with grouping flags: all 4 aggregation levels in one pass.
    "cube_sales" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .cube("l_returnflag", "l_linestatus")
          .agg(round(sum("l_quantity"), 4).as("sum_qty"),
            grouping(col("l_returnflag")).as("g_rf"),
            grouping(col("l_linestatus")).as("g_ls"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 4) AS sum_qty,
                grouping(l_returnflag) AS g_rf,
                grouping(l_linestatus) AS g_ls
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""),

    // String expression battery (1-based substring semantics match).
    "string_ops" -> QueryDef(
      (s, d) =>
        Tables.part(s, d).select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_type"), 1, 5).as("type5"),
          regexp_replace(col("p_name"), "part", "item").as("renamed"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
          .orderBy("p_partkey"),
      """SELECT p_partkey,
                upper(p_brand) AS brand_u,
                substring(p_type, 1, 5) AS type5,
                regexp_replace(p_name, 'part', 'item', 'g') AS renamed,
                length(p_name) AS name_len,
                concat_ws('|', p_brand, p_type) AS brand_type
         FROM part ORDER BY p_partkey"""),

    // Date expression battery: extraction + formatting + arithmetic.
    "date_ops" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(
            year(col("o_orderdate")).as("y"),
            quarter(col("o_orderdate")).as("q"))
          .agg(count(lit(1)).as("n"),
            min(date_format(col("o_orderdate"), "yyyy-MM")).as("first_month"),
            max(datediff(col("o_orderdate"), lit("1995-01-01"))).as("max_days_since"))
          .orderBy("y", "q"),
      """SELECT CAST(extract(year FROM o_orderdate) AS INT) AS y,
                CAST(extract(quarter FROM o_orderdate) AS INT) AS q,
                count(*) AS n,
                min(strftime(o_orderdate, '%Y-%m')) AS first_month,
                CAST(max(date_diff('day', DATE '1995-01-01',
                                   CAST(o_orderdate AS DATE))) AS INT)
                  AS max_days_since
         FROM orders GROUP BY 1, 2 ORDER BY y, q"""),

    // CASE-based bucketing.
    "case_tiers" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .withColumn("tier",
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 150000, "medium")
              .otherwise("large"))
          .groupBy("tier")
          .agg(count(lit(1)).as("n"),
            round(avg("o_totalprice"), 4).as("avg_price"))
          .orderBy("tier"),
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 150000 THEN 'medium'
                     ELSE 'large' END AS tier,
                count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
         FROM orders GROUP BY 1 ORDER BY tier"""),

    // Scalar subquery: orders above the global average.
    "above_avg_orders" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        val avgDf = o.agg(avg("o_totalprice").as("_avg"))
        o.crossJoin(broadcast(avgDf))
          .filter(col("o_totalprice") > col("_avg"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_above"))
          .orderBy("o_orderstatus")
      },
      """SELECT o_orderstatus, count(*) AS n_above
         FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
         GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    // INTERSECT: customers active in both order statuses.
    "intersect_keys" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
          .orderBy("o_custkey")
      },
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_custkey"""),

    // EXCEPT: customers with F orders but no O orders.
    "except_keys" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
          .orderBy("o_custkey")
      },
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_custkey"""),

    // HAVING: only groups above a support threshold.
    "having_filter" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("n_items"),
            round(sum("l_extendedprice"), 4).as("supp_revenue"))
          .filter(col("n_items") > 100)
          .orderBy("l_suppkey"),
      """SELECT l_suppkey, count(*) AS n_items,
                round(sum(l_extendedprice), 4) AS supp_revenue
         FROM lineitem GROUP BY l_suppkey HAVING count(*) > 100
         ORDER BY l_suppkey"""),

    // Per-group top-k: 3 biggest orders per market segment (window +
    // rank filter — the distributed top-k-per-key pattern).
    "topk_per_group" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
          .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
          .orderBy("c_mktsegment", "rk")
      },
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
           SELECT c_mktsegment, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders JOIN customer ON o_custkey = c_custkey) t
         WHERE rk <= 3 ORDER BY c_mktsegment, rk"""),

    // UNPIVOT/melt: wide measure columns → long (metric, value) rows.
    "unpivot_measures" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .select("l_returnflag", "l_quantity", "l_discount", "l_tax")
          .unpivot(
            ids = Array(col("l_returnflag")),
            values = Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            variableColumnName = "metric",
            valueColumnName = "v")
          .groupBy("l_returnflag", "metric")
          .agg(round(sum("v"), 4).as("total"))
          .orderBy("l_returnflag", "metric"),
      """SELECT l_returnflag, metric, round(sum(v), 4) AS total
         FROM (
           SELECT l_returnflag, metric, v
           FROM lineitem
           UNPIVOT (v FOR metric IN (l_quantity, l_discount, l_tax)))
         GROUP BY l_returnflag, metric ORDER BY l_returnflag, metric"""),

    // Window-function battery: lag/lead/ntile/percent_rank in one pass.
    "window_funcs" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .select("o_orderstatus", "o_orderkey", "o_totalprice")
          .withColumn("prev_price", round(lag("o_totalprice", 1).over(w), 4))
          .withColumn("next_price", round(lead("o_totalprice", 1).over(w), 4))
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("pct_rank", round(percent_rank().over(w), 6))
          .select("o_orderstatus", "o_orderkey", "prev_price", "next_price",
            "quartile", "pct_rank")
          .orderBy("o_orderstatus", "o_orderkey")
      },
      """SELECT o_orderstatus, o_orderkey,
                round(lag(o_totalprice, 1) OVER w, 4) AS prev_price,
                round(lead(o_totalprice, 1) OVER w, 4) AS next_price,
                CAST(ntile(4) OVER w AS INT) AS quartile,
                round(percent_rank() OVER w, 6) AS pct_rank
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderstatus, o_orderkey"""),

    // TPC-H Q5-style 5-way join: revenue by nation for one region+year,
    // dims broadcast down the chain, facts shuffle once on the agg key.
    "q5_region_revenue" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01") &&
              col("o_orderdate") < lit("1998-01-01"))
            .select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name").as("nation"))
          // exact long-cents money sum (q1_agg discipline — the double
          // sum diverged between engines in its last bits at sf10)
          .agg((sum(Tables.cents(col("l_extendedprice"))
              * (lit(100L) - Tables.cents(col("l_discount"))))
            .cast("double") / 10000.0).as("revenue"))
          .orderBy(col("revenue").desc, col("nation")),
      """SELECT n_name AS nation,
                CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                     AS DOUBLE) / 10000.0 AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name ORDER BY revenue DESC, nation"""))
}
