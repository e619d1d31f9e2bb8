package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Typed Dataset API coverage: case-class rows, typed filters, and a
  * custom `Aggregator[IN, BUF, OUT]` (the user-facing typed-aggregate
  * extension point, complementing the Catalyst-level
  * TypedImperativeAggregate in functions.TopKAgg).
  */
object TypedOps {

  case class Line(
      l_orderkey: Long,
      l_quantity: Double,
      l_extendedprice: Double,
      l_discount: Double,
      l_returnflag: String)

  /** Revenue-weighted mean discount: associative (sums), merge-safe. */
  case class WBuf(wsum: Double, w: Double)
  object WeightedDiscount extends Aggregator[Line, WBuf, Double] {
    override def zero: WBuf = WBuf(0.0, 0.0)
    override def reduce(b: WBuf, l: Line): WBuf = {
      val w = l.l_extendedprice
      WBuf(b.wsum + l.l_discount * w, b.w + w)
    }
    override def merge(a: WBuf, b: WBuf): WBuf = WBuf(a.wsum + b.wsum, a.w + b.w)
    override def finish(b: WBuf): Double =
      if (b.w == 0.0) 0.0 else b.wsum / b.w
    override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val defs: Map[String, QueryDef] = Map(

    // Typed pipeline: as[Line] → typed filter → groupByKey → custom
    // Aggregator. Oracle recomputes the weighted mean in SQL; the
    // division-last form keeps float order identical.
    "typed_weighted_disc" -> QueryDef(
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_extendedprice",
            "l_discount", "l_returnflag")
          .as[Line]
          .filter((l: Line) => l.l_quantity >= 5.0)
          .groupByKey(_.l_returnflag)
          .agg(WeightedDiscount.toColumn.name("wavg_disc"))
          .toDF("l_returnflag", "wavg_disc")
          .withColumn("wavg_disc", round(col("wavg_disc"), 6))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag,
                round(sum(l_discount * l_extendedprice)
                      / sum(l_extendedprice), 6) AS wavg_disc
         FROM lineitem WHERE l_quantity >= 5.0
         GROUP BY l_returnflag ORDER BY l_returnflag"""))
}
