package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Skew-mitigation operators (SURVEY §5): at 100 TB a handful of hot
  * keys (a viral user, an empty-string default) can pin a whole
  * aggregation or join on one reducer. Two standard remedies, both
  * semantics-preserving:
  *
  *  - salted two-phase aggregation: shuffle on (key, salt) first so a
  *    hot key spreads over `salts` reducers, then combine the partials
  *    with a second (tiny) shuffle on key alone. Associative aggregates
  *    only — sums/counts/min/max.
  *  - AQE skew-join splitting is enabled in the session configs for the
  *    join side of the same problem (`spark.sql.adaptive.skewJoin`).
  */
object Skew {

  /** Two-phase salted sum/count. `saltFrom` must be a deterministic
    * per-row column (an id); the salt value itself never affects the
    * result, only the shuffle spread.
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltFrom: Column, salts: Int): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(saltFrom, lit(salts)))
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n"))
  }

  /** Salted join: the fact side gets a deterministic salt from a
    * per-row id; the (hot) dim side is replicated across all `salts`
    * values, so one hot join key spreads over `salts` reducers instead
    * of pinning one. Result is identical to the plain equi-join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltFrom: Column, salts: Int): DataFrame = {
    val f = fact.withColumn("_salt", pmod(saltFrom, lit(salts)))
    val dExp = dim.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    f.join(dExp,
      f(factKey) === dExp(dimKey) && f("_salt") === dExp("_salt"))
      .drop("_salt")
  }

  val defs: Map[String, QueryDef] = Map(

    // C55 — salted join equals the plain-join oracle.
    "salted_join" -> QueryDef(
      (s, d) =>
        saltedJoin(
          Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
          Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
          "o_custkey", "c_custkey", col("o_orderkey"), salts = 8)
          .groupBy("c_mktsegment")
          // exact long-cents money sum (q1_agg discipline)
          .agg(count(lit(1)).as("n_orders"),
            (sum(Tables.cents(col("o_totalprice")))
              .cast("double") / 100.0).as("revenue"))
          .orderBy("c_mktsegment"),
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     AS DOUBLE) / 100.0 AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment"""),

    // Salted aggregation produces bit-identical results to the plain
    // GROUP BY oracle (associative double sums re-rounded at 4 dp).
    "salted_agg" -> QueryDef(
      (s, d) =>
        saltedAgg(Tables.events(s, d), Seq("user_id"), "value",
          col("event_id"), salts = 8)
          .withColumn("sum_value", round(col("sum_value"), 4))
          .orderBy("user_id"),
      """SELECT user_id, round(sum(value), 4) AS sum_value, count(*) AS n
         FROM events GROUP BY user_id ORDER BY user_id"""))
}
