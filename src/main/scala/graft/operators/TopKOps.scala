package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.TopKAgg
import graft.{QueryDef, Tables}

/** Per-group top-k via the custom bounded-heap TypedImperativeAggregate
  * (`functions.TopKByScore`) — contrast with `topk_per_group`, which
  * uses window row_number and therefore shuffles every row of every
  * group. The aggregate version moves only O(k·partitions) rows per key.
  * The oracle is the independent window formulation, so the gate proves
  * both agree.
  */
object TopKOps {

  val defs: Map[String, QueryDef] = Map(
    "topk_agg" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_orderstatus")
          .agg(TopKAgg.topK(col("o_orderkey"), col("o_totalprice"), 3).as("top"))
          .select(col("o_orderstatus"), posexplode(col("top")))
          .select(col("o_orderstatus"),
            (col("pos") + 1).cast("int").as("rk"),
            col("col.payload").as("o_orderkey"),
            col("col.score").as("o_totalprice"))
          .orderBy("o_orderstatus", "rk"),
      """SELECT o_orderstatus, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice
         FROM (
           SELECT o_orderstatus, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderstatus
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_orderstatus, rk"""))
}
