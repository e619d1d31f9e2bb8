package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** The reference's five Athena analytics queries
  * (`/root/reference/athena_sql_query_examples/` — five .sql files), re-based onto the
  * test star schema: `orders.o_totalprice` ≈ purchase amount, `part` ≈
  * product catalog, `customer` ≈ client, `nation.n_name` ≈ country,
  * `events.event_type` ≈ payment_type.
  *
  * Scale notes: every dimension side (`part`, `customer`, `nation`) is
  * explicitly broadcast — at 100 TB the fact tables (`lineitem`,
  * `orders`, `events`) shuffle only when an aggregation key demands it,
  * and partial (map-side) aggregation always runs first.
  */
object RefQueries {

  val defs: Map[String, QueryDef] = Map(

    // GetAverageOrderValue.sql — scalar AVG over the fact table.
    "ref_avg_order_value" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .agg(round(avg("o_totalprice"), 4).as("average_order_value")),
      "SELECT round(avg(o_totalprice), 4) AS average_order_value FROM orders"),

    // MostSalesProducts.sql — grouped SUM + ORDER BY DESC over an
    // exploded fact⋈dim join. part is a dim → broadcast, so the only
    // shuffle is the final aggregation on p_name.
    "ref_top_products" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d).select("l_partkey", "l_quantity")
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_name")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_name").as("name"))
          .agg(round(sum("l_quantity"), 4).as("total_quantity_sold"))
          .orderBy(col("total_quantity_sold").desc, col("name")),
      """SELECT p_name AS name, round(sum(l_quantity), 4) AS total_quantity_sold
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_name ORDER BY total_quantity_sold DESC, name"""),

    // OrderAndClientDetails.sql — inner-join projection (order ⋈ client).
    "ref_order_customer" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")
          .join(broadcast(Tables.customer(s, d)
            .select("c_custkey", "c_name", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus",
            "c_name", "c_mktsegment")
          .orderBy("o_orderkey"),
      """SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
                c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey"""),

    // TotalIncomePerPaymentMethod.sql — grouped SUM by category.
    "ref_income_by_type" -> QueryDef(
      (s, d) =>
        Tables.events(s, d).select("event_type", "value")
          .groupBy(col("event_type").as("payment_type"))
          .agg(round(sum("value"), 4).as("total_income"))
          .orderBy(col("total_income").desc, col("payment_type")),
      """SELECT event_type AS payment_type,
                round(sum(value), 4) AS total_income
         FROM events GROUP BY event_type
         ORDER BY total_income DESC, payment_type"""),

    // TotalSalesPerCountry.sql — fact ⋈ dim ⋈ dim + grouped SUM by geo.
    "ref_sales_by_country" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d).select("o_custkey", "o_totalprice")
          .join(broadcast(Tables.customer(s, d)
            .select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("country"))
          // exact decimal money fold (decimal_sum discipline): per-
          // country sums reach ~1e10, where a 4 dp round of a double
          // sum sits past the order-independent digits — the sf1 scale
          // step flipped the last digit between partition-order and
          // sequential summation. Decimal addition is associative; the
          // gate transports the sum as its EXACT decimal string rather
          // than a double (round-7 ADVICE: DuckDB's int128/10^scale →
          // double conversion rounds in two steps, so a 1-ulp
          // divergence from Spark's BigDecimal.doubleValue was
          // possible for non-representable sums; the string rendering
          // of a scale-4 decimal is identical by construction).
          .agg(sum(col("o_totalprice").cast("decimal(18,4)"))
            .cast("decimal(28,4)").as("_ts"))
          .orderBy(col("_ts").desc, col("country"))
          .select(col("country"), col("_ts").cast("string").as("total_sales")),
      """SELECT n_name AS country,
                CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                          AS DECIMAL(28,4)) AS STRING) AS total_sales
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name
         ORDER BY sum(CAST(o_totalprice AS DECIMAL(18,4))) DESC, country"""))
}
