package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A/B for the WIRE memo storage format and for from_json parse-schema
  * pruning (round-16 items 1 and 2): the round-15 verdict flagged
  * ingest_decode as regressed after the wire memo moved from columnar
  * persist to localCheckpoint, and the decode-family plans parse the
  * FULL 7-field order schema when their projections touch 1–4 fields
  * (the optimizer cannot prune: the parse and the field accesses sit in
  * different projections, and CollapseProject refuses to inline a
  * non-cheap expression used N times — checked in
  * plans/r15/ingest_decode_after.txt).
  *
  * Sections:
  *  - wire memo storage: persist(MEMORY_AND_DISK) vs localCheckpoint,
  *    decode-consume ×2 each (the ingest_decode shape)
  *  - parse pruning: full orderEventSchema vs the consumer's pruned
  *    schema for the ingest_decode, dlq-accounting and fanout_products
  *    shapes, over the SAME checkpointed wire frame
  *
  * Usage: runMain graft.tools.WireMicro <sfDir>
  */
object WireMicro {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(4, cpus.toInt / 2).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) taskCpuNs.addAndGet(m.executorCpuTime)
        }
      })
    def timed[T](name: String)(body: => T): T = {
      org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext)
      taskCpuNs.set(0L)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext)
      println(f"[wiremicro] $name%-44s wall=$wall%8.3f cpu=${taskCpuNs.get() / 1e9}%8.3f")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.ingest.{EventCodec, SyntheticOrders}
    val nested = SyntheticOrders.nested(spark, sfDir) // checkpointed memo
    def wirePlan(): DataFrame = EventCodec.encode(nested)

    // the ingest_decode consumer shape (decode + narrow project + sort)
    def decodeShape(wire: DataFrame): DataFrame =
      EventCodec.decode(wire).select(
        col("order_id"), col("status"),
        round(col("purchaise_details.amount"), 4).as("amount"),
        size(col("product_details")).as("n_products"))

    // A: columnar persist (round-14 shape)
    val a = wirePlan().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("A wire persist(M_AND_D): materialize")(noop(a))
    timed("A persist: decode consume x1")(noop(decodeShape(a)))
    timed("A persist: decode consume x2")(noop(decodeShape(a)))
    a.unpersist(true)

    // B: localCheckpoint (round-15 shape, current)
    val b = timed("B wire localCheckpoint(eager)")(wirePlan().localCheckpoint(true))
    timed("B lc: decode consume x1")(noop(decodeShape(b)))
    timed("B lc: decode consume x2")(noop(decodeShape(b)))

    // ---- parse-schema pruning over the SAME checkpointed wire frame ----
    def parsed(schema: StructType): DataFrame =
      b.withColumn("_evt",
        from_json(try_to_binary(col("data"), lit("base64")).cast(StringType),
          schema))

    val full = EventCodec.orderEventSchema
    def pruneTo(names: String*): StructType =
      StructType(full.fields.filter(f => names.contains(f.name)))

    // ingest_decode shape: order_id, status, purchaise_details.amount,
    // size(product_details)
    val decodePruned = StructType(Seq(
      StructField("order_id", StringType),
      StructField("status", StringType),
      StructField("purchaise_details",
        StructType(Seq(StructField("amount", DoubleType)))),
      full("product_details")))
    def decodeProj(df: DataFrame): DataFrame = df.select(
      col("_evt.order_id").as("order_id"), col("_evt.status").as("status"),
      round(col("_evt.purchaise_details.amount"), 4).as("amount"),
      size(col("_evt.product_details")).as("n_products"))
    timed("decode full-schema x1")(noop(decodeProj(parsed(full))))
    timed("decode full-schema x2")(noop(decodeProj(parsed(full))))
    timed("decode pruned-schema x1")(noop(decodeProj(parsed(decodePruned))))
    timed("decode pruned-schema x2")(noop(decodeProj(parsed(decodePruned))))

    // dlq-accounting shape: only order_id
    val dlqPruned = pruneTo("order_id")
    def dlqProj(df: DataFrame): DataFrame = df.agg(
      count(when(col("_evt.order_id").isNotNull, 1)).as("n_good"),
      count(when(col("_evt.order_id").isNull, 1)).as("n_bad"),
      sum(substring(col("_evt.order_id"), 2, 18).cast("long")).as("good_key_sum"))
    timed("dlq full-schema x1")(noop(dlqProj(parsed(full))))
    timed("dlq full-schema x2")(noop(dlqProj(parsed(full))))
    timed("dlq pruned-schema x1")(noop(dlqProj(parsed(dlqPruned))))
    timed("dlq pruned-schema x2")(noop(dlqProj(parsed(dlqPruned))))

    // fanout_products shape: order_id + full product_details explode
    val fanoutPruned = pruneTo("order_id", "product_details")
    def fanoutProj(df: DataFrame): DataFrame =
      graft.ingest.Fanout.productDetails(df.select(col("_evt.*")))
    timed("fanout full-schema x1")(noop(fanoutProj(parsed(full))))
    timed("fanout full-schema x2")(noop(fanoutProj(parsed(full))))
    timed("fanout pruned-schema x1")(noop(fanoutProj(parsed(fanoutPruned))))
    timed("fanout pruned-schema x2")(noop(fanoutProj(parsed(fanoutPruned))))

    spark.stop()
  }
}
