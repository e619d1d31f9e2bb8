package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** The remaining TPC-H bodies expressible on the trimmed test schema
  * (no partsupp / commitdate / receiptdate columns exist, so Q4 swaps
  * its commit-vs-receipt EXISTS for a late-shipment EXISTS and Q9/Q11/
  * Q16/Q20/Q21 are out of scope): Q3, Q4, Q7, Q8, Q10, Q13, Q15.
  * All oracle-checked.
  *
  * Plan discipline: nation/region/part/supplier sides broadcast (dims);
  * orders⋈customer and lineitem⋈orders shuffle on their natural keys
  * and stay AQE-planned. Top-k orderings sort on the ROUNDED revenue
  * with a key tiebreak so cross-engine ulp noise cannot reorder ranks.
  */
object TpchFull {

  private def revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))

  val defs: Map[String, QueryDef] = Map(

    // Q3 — shipping priority: top unshipped-revenue orders for one
    // market segment at a cutoff date.
    "q3_shipping_priority" -> QueryDef(
      (s, d) =>
        Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
          .join(Tables.orders(s, d)
              .filter(col("o_orderdate") < lit("1997-07-01"))
              .select("o_orderkey", "o_custkey", "o_orderdate"),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d)
              .filter(col("l_shipdate") > lit("1997-07-01"))
              .select("l_orderkey", "l_extendedprice", "l_discount"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("l_orderkey", "o_orderdate")
          .agg(round(sum(revenue), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10),
      """SELECT l_orderkey, o_orderdate,
                round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-07-01'
           AND l_shipdate  > TIMESTAMP '1997-07-01'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10"""),

    // Q4 flavor — order-priority check: orders from one year with at
    // least one line shipped more than 60 days after the order date
    // (the trimmed schema has no commit/receipt dates, so "late" is
    // ship-lag; the EXISTS becomes a left-semi join, the same
    // decorrelation Catalyst performs).
    "q4_late_orders" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1997-01-01"))
          .join(Tables.lineitem(s, d).select("l_orderkey", "l_shipdate"),
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1997-01-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // Q7 — volume shipping between two nations, by supplier nation,
    // customer nation and ship year.
    "q7_volume_shipping" -> QueryDef(
      (s, d) => {
        val n = Tables.nation(s, d).select("n_nationkey", "n_name")
        val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount")
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(round(sum(revenue), 4).as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
                round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),

    // Q8 — market share: fraction of ASIA-customer revenue in one part
    // type supplied from NATION_5, per order year. Numerator and
    // denominator aggregate in the same pass; one division at the end.
    "q8_market_share" -> QueryDef(
      (s, d) => {
        val n = Tables.nation(s, d)
        val asiaNations = n
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("asia_nationkey"))
        val suppNation = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
          .join(broadcast(n.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount")
          .join(broadcast(Tables.part(s, d)
              .filter(col("p_type") === "PROMO").select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(asiaNations),
            col("c_nationkey") === col("asia_nationkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_5", revenue).otherwise(lit(0.0))) /
              sum(revenue), 4).as("mkt_share"))
          .orderBy("o_year")
      },
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                round(sum(CASE WHEN sn.n_name = 'NATION_5'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0.0 END) /
                      sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
         FROM lineitem
         JOIN part     ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN region   ON cn.n_regionkey = r_regionkey
         WHERE p_type = 'PROMO' AND r_name = 'ASIA'
         GROUP BY 1 ORDER BY o_year"""),

    // Q10 — returned-item report: top 20 customers by lost revenue in
    // one quarter.
    "q10_returned_items" -> QueryDef(
      (s, d) =>
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .join(Tables.orders(s, d)
              .filter(col("o_orderdate") >= lit("1996-10-01") &&
                col("o_orderdate") < lit("1997-01-01"))
              .select("o_orderkey", "o_custkey"),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
              .select("l_orderkey", "l_extendedprice", "l_discount"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(round(sum(revenue), 4).as("lost_revenue"))
          .orderBy(col("lost_revenue").desc, col("c_custkey"))
          .limit(20),
      """SELECT c_custkey, c_name, c_acctbal, n_name,
                round(sum(l_extendedprice * (1 - l_discount)), 4)
                  AS lost_revenue
         FROM customer
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderdate >= TIMESTAMP '1996-10-01'
           AND o_orderdate <  TIMESTAMP '1997-01-01'
           AND l_returnflag = 'R'
         GROUP BY 1, 2, 3, 4
         ORDER BY lost_revenue DESC, c_custkey LIMIT 20"""),

    // Q13 — customer order-count distribution, zero-order customers
    // included (the left join Q13 exists to test).
    "q13_order_counts" -> QueryDef(
      (s, d) =>
        Tables.customer(s, d).select("c_custkey")
          .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc),
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c_custkey, count(o_orderkey) AS c_count
               FROM customer LEFT JOIN orders ON c_custkey = o_custkey
               GROUP BY c_custkey) t
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),

    // Q15 — top supplier(s): revenue per supplier over one quarter,
    // keep every supplier hitting the maximum. The max is a scalar
    // broadcast; equality compares the ROUNDED revenue on both sides
    // so cross-engine ulp noise cannot drop the winner.
    "q15_top_supplier" -> QueryDef(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1996-04-01"))
          .groupBy("l_suppkey")
          .agg(round(sum(revenue), 4).as("total_revenue"))
        val top = rev.agg(max("total_revenue").as("max_revenue"))
        rev.join(broadcast(top),
            col("total_revenue") === col("max_revenue"))
          .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy("s_suppkey")
      },
      """WITH rev AS (
           SELECT l_suppkey,
                  round(sum(l_extendedprice * (1 - l_discount)), 4)
                    AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         ORDER BY s_suppkey"""))
}
