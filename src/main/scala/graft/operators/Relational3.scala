package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Third relational batch: full outer join, null-handling expressions,
  * exact decimal arithmetic.
  */
object Relational3 {

  val defs: Map[String, QueryDef] = Map(

    // Full outer join: per-nation customer and supplier counts, either
    // side may be absent.
    "full_outer_join" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("ck"))
          .agg(count(lit(1)).as("n_customers"))
        val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("sk"))
          .agg(count(lit(1)).as("n_suppliers"))
        c.join(su, col("ck") === col("sk"), "full_outer")
          .select(
            coalesce(col("ck"), col("sk")).as("nationkey"),
            coalesce(col("n_customers"), lit(0L)).as("n_customers"),
            coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
          .orderBy("nationkey")
      },
      """SELECT coalesce(ck, sk) AS nationkey,
                coalesce(n_customers, 0) AS n_customers,
                coalesce(n_suppliers, 0) AS n_suppliers
         FROM (SELECT c_nationkey AS ck, count(*) AS n_customers
               FROM customer GROUP BY 1) c
         FULL OUTER JOIN
              (SELECT s_nationkey AS sk, count(*) AS n_suppliers
               FROM supplier GROUP BY 1) s
           ON ck = sk
         ORDER BY nationkey"""),

    // Null-handling battery: nullif / coalesce / null-aware counting.
    "null_handling" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .withColumn("disc_or_null", nullif(col("l_discount"), lit(0.0)))
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("disc_or_null")).as("n_discounted"),
            round(avg(coalesce(col("disc_or_null"), lit(0.0))), 6)
              .as("avg_disc_with_zeros"),
            round(avg(col("disc_or_null")), 6).as("avg_disc_nonzero"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag,
                count(*) AS n_rows,
                count(nullif(l_discount, 0.0)) AS n_discounted,
                round(avg(coalesce(nullif(l_discount, 0.0), 0.0)), 6)
                  AS avg_disc_with_zeros,
                round(avg(nullif(l_discount, 0.0)), 6) AS avg_disc_nonzero
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Exact decimal arithmetic: money sums must not be floating point at
    // 100 TB — cast once at the scan, aggregate exactly.
    "decimal_sum" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .withColumn("price_dec",
            col("o_totalprice").cast("decimal(18,2)"))
          .groupBy("o_orderstatus")
          // aggregation is exact decimal; the final cast to double is
          // transport-only (the gate reads Spark parquet with pyarrow —
          // Decimal objects — but DuckDB results as float64; both sides
          // take the nearest double of the SAME exact decimal)
          .agg(sum(col("price_dec")).cast("decimal(18,2)").cast("double")
              .as("total_exact"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
                CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DECIMAL(18,2)) AS DOUBLE)
                  AS total_exact,
                count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))
}
