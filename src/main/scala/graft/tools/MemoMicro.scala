package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the SyntheticOrders memo storage format (round-15): the
  * columnar `.persist(MEMORY_AND_DISK)` of the nested-doc frame was
  * measured at ~17× the cost of building the docs (InMemoryRelation's
  * per-value columnar conversion of array<struct> payloads, paid again
  * on every cached read). Candidates: localCheckpoint (UnsafeRow blocks,
  * no conversion) and a scratch-parquet landing.
  *
  * Usage: runMain graft.tools.MemoMicro <sfDir>
  */
object MemoMicro {

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
      println(f"[memomicro] $name%-40s wall=$wall%8.3f cpu=${taskCpuNs.get() / 1e9}%8.3f")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // fresh nested build plan (no memo)
    def build(): DataFrame = {
      import graft.Tables
      val o = Tables.orders(spark, sfDir)
      val li = Tables.lineitem(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
        .select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
      val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      val products = li
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
    def encodeOf(df: DataFrame): DataFrame =
      graft.ingest.EventCodec.encode(df)

    // A: columnar persist (current shape)
    val a = build().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("A persist(M_AND_D): materialize")(noop(a))
    timed("A persist: encode consume x1")(noop(encodeOf(a)))
    timed("A persist: encode consume x2")(noop(encodeOf(a)))
    a.unpersist(true)

    // B: localCheckpoint
    val b = timed("B localCheckpoint(eager)")(build().localCheckpoint(true))
    timed("B lc: encode consume x1")(noop(encodeOf(b)))
    timed("B lc: encode consume x2")(noop(encodeOf(b)))

    // C: scratch parquet landing
    val dir = graft.Tables.freshScratchDir("memomicro") + "/nested"
    timed("C parquet land")(build().write.mode("overwrite").parquet(dir))
    val cDf = spark.read.parquet(dir)
    println(s"[memomicro] C partitions=${cDf.rdd.getNumPartitions}")
    timed("C pq: encode consume x1")(noop(encodeOf(cDf)))
    timed("C pq: encode consume x2")(noop(encodeOf(cDf)))
    val cW = cDf.repartition(spark.sparkContext.defaultParallelism)
    timed("C pq+rep: encode consume")(noop(encodeOf(cW)))
    spark.stop()
  }
}
