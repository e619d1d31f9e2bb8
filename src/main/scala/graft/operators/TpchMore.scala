package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Additional TPC-H-shaped analytics: conditional aggregation over a
  * join (Q12), aggregate-ratio in one pass (Q14), disjunctive
  * multi-predicate scan (Q19 flavor), correlated-minimum pattern (Q2
  * flavor). All oracle-checked.
  */
object TpchMore {

  val defs: Map[String, QueryDef] = Map(

    // Q12 flavor: join + per-bucket conditional counts.
    "q12_priority_class" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01"))
          .select("l_orderkey", "l_linestatus")
          .join(Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(
            count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("high_line_count"),
            count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("low_line_count"))
          .orderBy("l_linestatus"),
      """SELECT l_linestatus,
                count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 1 END) AS high_line_count,
                count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                           THEN 1 END) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l_linestatus ORDER BY l_linestatus"""),

    // Q14 flavor: ratio of conditional revenue to total revenue in one
    // aggregation pass (numerator/denominator computed together, single
    // division at the end keeps the float order identical cross-engine).
    "q14_brand_share" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d).select("l_partkey", "l_extendedprice", "l_discount")
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .agg(
            round(
              sum(when(col("p_brand") === "Brand#1",
                col("l_extendedprice") * (lit(1) - col("l_discount")))
                .otherwise(lit(0.0))) * lit(100.0) /
                sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
              .as("brand1_share_pct")),
      """SELECT round(
                  sum(CASE WHEN p_brand = 'Brand#1'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0.0 END) * 100.0 /
                  sum(l_extendedprice * (1 - l_discount)), 4)
                  AS brand1_share_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey"""),

    // Q19 flavor: disjunction of conjunctive predicate groups — the
    // whole OR-tree evaluates in the scan stage.
    "q19_disjunctive" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_size", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
              (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
                col("l_quantity").between(10, 30)))
          // exact long-cents money sum (q1_agg discipline)
          .agg((sum(Tables.cents(col("l_extendedprice"))
              * (lit(100L) - Tables.cents(col("l_discount"))))
            .cast("double") / 10000.0).as("revenue"),
            count(lit(1)).as("n_lines")),
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                     AS DOUBLE) / 10000.0 AS revenue,
                count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                AND l_quantity BETWEEN 10 AND 30)"""),

    // Q2 flavor: correlated minimum — rows matching their group's
    // minimum, via a broadcast of the per-group minima (the decorrelated
    // plan Catalyst itself would produce).
    "q2_group_min" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val mins = li.groupBy(col("l_partkey").as("m_partkey"))
          .agg(min("l_extendedprice").as("min_price"))
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
          .join(broadcast(mins),
            col("l_partkey") === col("m_partkey") &&
              col("l_extendedprice") === col("min_price"))
          .groupBy("l_partkey")
          .agg(min("l_suppkey").as("cheapest_supp"),
            round(min("l_extendedprice"), 4).as("min_price"))
          .orderBy("l_partkey")
      },
      """SELECT l_partkey, min(l_suppkey) AS cheapest_supp,
                round(min(l_extendedprice), 4) AS min_price
         FROM lineitem l
         WHERE l_extendedprice = (SELECT min(l_extendedprice)
                                  FROM lineitem WHERE l_partkey = l.l_partkey)
         GROUP BY l_partkey ORDER BY l_partkey"""))
}
