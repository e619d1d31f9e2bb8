package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Component-level timing for the ingest doc-build + wire-codec path
  * (round-15 guide §1.1 empirical loop): nested_orders_build measured
  * ~70 executor-CPU-s and wire_events_build ~108 CPU-s at sf0.1 in
  * isolation — this main splits those into stages so the optimization
  * targets the actual burner, not a guess.
  *
  * Usage: runMain graft.tools.CodecMicro <sfDir>
  */
object CodecMicro {

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
    def time(name: String)(df: => DataFrame): Unit = {
      // rep 0 warms JIT; reps 1-2 reported
      var best = (Double.MaxValue, Double.MaxValue)
      for (r <- 0 to 2) {
        org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext)
        taskCpuNs.set(0L)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext)
        val cpu = taskCpuNs.get() / 1e9
        if (r > 0 && wall < best._1) best = (wall, cpu)
      }
      println(f"[codecmicro] $name%-34s wall=${best._1}%8.3f cpu=${best._2}%8.3f")
    }

    import graft.Tables
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)

    // ---- nested_orders_build decomposition ----
    time("lineitem scan only") {
      li.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
        "l_returnflag", "l_linestatus")
    }
    val productsNoSort = li
      .repartition(spark.sparkContext.defaultParallelism, col("l_orderkey"))
      .select(
        col("l_orderkey"),
        struct(
          col("l_linenumber").as("line_number"),
          concat(lit("p"), col("l_partkey")).as("product_id"),
          concat(lit("part_"), col("l_partkey")).as("name"),
          col("l_quantity").cast("int").as("quantity"),
          struct(
            col("l_returnflag").as("color"),
            col("l_linestatus").as("size")).as("item_details")).as("pd"))
      .groupBy("l_orderkey")
      .agg(collect_list(col("pd")).as("sorted_pd"))
    time("products agg (collect_list)") { productsNoSort }
    val productsSorted = li
      .repartition(spark.sparkContext.defaultParallelism, col("l_orderkey"))
      .select(
        col("l_orderkey"),
        struct(
          col("l_linenumber").as("line_number"),
          concat(lit("p"), col("l_partkey")).as("product_id"),
          concat(lit("part_"), col("l_partkey")).as("name"),
          col("l_quantity").cast("int").as("quantity"),
          struct(
            col("l_returnflag").as("color"),
            col("l_linestatus").as("size")).as("item_details")).as("pd"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("pd"))).as("sorted_pd"))
    time("products agg + sort_array") { productsSorted }
    time("products agg + sort + transform") {
      productsSorted.withColumn("product_details", transform(col("sorted_pd"), p =>
        struct(
          p.getField("product_id").as("product_id"),
          p.getField("name").as("name"),
          p.getField("quantity").as("quantity"),
          p.getField("line_number").as("line_number"),
          p.getField("item_details").as("item_details"))))
        .drop("sorted_pd")
    }
    val nestedFresh = {
      // full build WITHOUT memo/persist (copy of SyntheticOrders.build)
      val c = Tables.customer(spark, sfDir)
        .select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
      val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      val products = productsSorted
        .withColumn("product_details", transform(col("sorted_pd"), p =>
          struct(
            p.getField("product_id").as("product_id"),
            p.getField("name").as("name"),
            p.getField("quantity").as("quantity"),
            p.getField("line_number").as("line_number"),
            p.getField("item_details").as("item_details"))))
        .drop("sorted_pd")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(products, col("o_orderkey") === col("l_orderkey"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
          concat(lit("user"), col("o_custkey")).as("customer_id"),
          concat(lit("o"), col("o_orderkey")).as("order_id"),
          concat(date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"), lit("Z"))
            .as("order_date"),
          col("o_orderstatus").as("status"),
          struct(
            col("c_name").as("street"),
            concat(lit("city"), col("c_nationkey")).as("city"),
            col("c_mktsegment").as("state"),
            lpad(col("o_custkey").cast("string"), 5, "0").as("zip"),
            col("n_name").as("country")).as("shipping_address"),
          struct(
            col("o_orderpriority").as("payment_type"),
            col("o_totalprice").as("amount"),
            lit("USD").as("currency"),
            (pmod(col("o_orderkey"), lit(12)) + 1).cast("int").as("instalments"))
            .as("purchaise_details"),
          col("product_details"))
    }
    time("nested full build (no persist)") { nestedFresh }

    // land nested once so the encode variants read identical input
    val scratch = graft.Tables.freshScratchDir("codecmicro")
    nestedFresh.write.mode("overwrite").parquet(scratch + "/nested")
    val nested = spark.read.parquet(scratch + "/nested")

    // ---- wire encode decomposition (on the landed nested frame) ----
    time("nested scan only") { nested }
    time("to_json") {
      nested.select(to_json(struct(nested.columns.map(col).toIndexedSeq: _*))
        .as("data"))
    }
    time("to_json + base64") {
      nested.select(base64(to_json(
        struct(nested.columns.map(col).toIndexedSeq: _*))).as("data"))
    }
    time("to_json + base64 + regexp") {
      nested.select(regexp_replace(base64(to_json(
        struct(nested.columns.map(col).toIndexedSeq: _*))), "[\\r\\n]", "")
        .as("data"))
    }
    time("to_json + base64 + translate") {
      nested.select(translate(base64(to_json(
        struct(nested.columns.map(col).toIndexedSeq: _*))), "\r\n", "")
        .as("data"))
    }

    // ---- decode decomposition (on a landed wire frame) ----
    graft.ingest.EventCodec.encode(nested)
      .write.mode("overwrite").parquet(scratch + "/wire")
    val wire = spark.read.parquet(scratch + "/wire")
    time("wire scan only") { wire }
    time("unbase64 only") {
      wire.select(length(try_to_binary(col("data"), lit("base64"))).as("n"))
    }
    time("full decode (from_json)") {
      graft.ingest.EventCodec.decode(wire)
    }
    time("ingest_decode projection") {
      graft.ingest.EventCodec.decode(wire).select(
        col("order_id"), col("status"),
        round(col("purchaise_details.amount"), 4).as("amount"),
        size(col("product_details")).as("n_products"))
    }
    spark.stop()
  }
}
