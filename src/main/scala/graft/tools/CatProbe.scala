package graft.tools
import org.apache.spark.sql.functions._
object CatProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(4, cpus.toInt / 2).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () } }
    val nested = graft.ingest.SyntheticOrders.nested(spark, sfDir)
    nested.write.format("noop").mode("overwrite").save()
    def t[T](name: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      println(f"[catprobe] $name%-40s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r }
    val keyed2 = nested
      .withColumn("year", substring(col("order_date"), 1, 4))
      .withColumn("month", substring(col("order_date"), 6, 2))
    val base = graft.Tables.freshScratchDir("catprobe")
    import graft.ingest.{Fanout, PartitionedSink}
    t("write orders sink") {
      PartitionedSink.write(
        Fanout.withPartitionKeys(Fanout.orders(nested), col("order_date"))
          .select("order_id","customer_id","order_date","status","year","month"),
        base + "/orders", Seq("year","month"), Seq("customer_id")) }
    t("write product sink") {
      PartitionedSink.write(Fanout.productDetails(keyed2, passthrough = Seq("year","month")),
        base + "/pd", Seq("year","month")) }
    t("write purchase sink") {
      PartitionedSink.write(Fanout.purchaseDetails(keyed2, passthrough = Seq("year","month")),
        base + "/pur", Seq("year","month")) }
    t("write addresses sink") {
      PartitionedSink.write(Fanout.shippingAddresses(keyed2, passthrough = Seq("year","month")),
        base + "/sa", Seq("country","year","month")) }
    t("ddl+msck orders") {
      spark.sql(s"CREATE TABLE cp_o (order_id STRING, customer_id STRING, order_date DATE, status STRING, year STRING, month STRING) USING PARQUET PARTITIONED BY (year, month) LOCATION '$base/orders'")
      spark.sql("MSCK REPAIR TABLE cp_o") }
    t("ddl+msck addresses") {
      spark.sql(s"CREATE TABLE cp_sa (order_id STRING, country STRING, state STRING, city STRING, street STRING, zip STRING, year STRING, month STRING) USING PARQUET PARTITIONED BY (country, year, month) LOCATION '$base/sa'")
      spark.sql("MSCK REPAIR TABLE cp_sa") }
    t("addresses sink v2 committer") {
      Fanout.shippingAddresses(keyed2, passthrough = Seq("year","month"))
        .hint("rebalance", col("country"), col("year"), col("month"))
        .write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("country","year","month").parquet(base + "/sa2") }
    t("addresses sink small block") {
      Fanout.shippingAddresses(keyed2, passthrough = Seq("year","month"))
        .hint("rebalance", col("country"), col("year"), col("month"))
        .write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .partitionBy("country","year","month").parquet(base + "/sa3") }
    t("addresses sink v2+smallblock") {
      Fanout.shippingAddresses(keyed2, passthrough = Seq("year","month"))
        .hint("rebalance", col("country"), col("year"), col("month"))
        .write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .partitionBy("country","year","month").parquet(base + "/sa4") }
    t("addresses sink plain again (warm)") {
      Fanout.shippingAddresses(keyed2, passthrough = Seq("year","month"))
        .hint("rebalance", col("country"), col("year"), col("month"))
        .write.mode("overwrite")
        .partitionBy("country","year","month").parquet(base + "/sa5") }
    spark.stop()
  }
}
