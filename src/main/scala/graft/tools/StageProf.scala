package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage CPU attribution for the one-shot ingest build lines
  * (round-15): the nested build costs ~4 executor-CPU-s warm but
  * ~45-60 cold, in every codegen variant — this main runs the builds
  * cold and prints every stage's executorCpuTime/executorRunTime so
  * the burner stage is identified instead of guessed.
  *
  * Usage: runMain graft.tools.StageProf <sfDir> <what: nested|dlq|both> [cpus]
  */
object StageProf {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val what = if (args.length > 1) args(1) else "both"
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
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = e.stageInfo
          val m = i.taskMetrics
          println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d " +
            f"cpu=${m.executorCpuTime / 1e9}%8.3f run=${m.executorRunTime / 1e3}%8.3f " +
            f"gc=${m.jvmGCTime / 1e3}%7.3f " +
            f"srB=${m.shuffleReadMetrics.totalBytesRead}%12d " +
            f"swB=${m.shuffleWriteMetrics.bytesWritten}%12d  ${i.name.take(60)}")
        }
      })
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    if (what == "nested" || what == "both") {
      println("=== nested build one-shot ===")
      graft.ingest.SyntheticOrders.nested(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    if (what == "dlq" || what == "both") {
      println("=== dlq land one-shot ===")
      graft.ingest.SyntheticOrders.dlqWireDir(spark, sfDir)
    }
    if (what == "catalog") {
      println("=== catalogTables one-shot ===")
      graft.ingest.IngestQueries.catalogTables(spark, sfDir)
      println("=== catalog_join consume ===")
      graft.SparkEntry.queries("catalog_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    if (what == "pairs") {
      println("=== shared_pairs one-shot ===")
      graft.dedup.Dedup.sharedPairs(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    if (what == "catparts") {
      val nested = graft.ingest.SyntheticOrders.nested(spark, sfDir)
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      println("=== pd explode only ===")
      noop(graft.ingest.Fanout.productDetails(nested,
        passthrough = Seq("order_date")))
      println("=== pd explode + keys ===")
      val isoTs = to_timestamp(regexp_replace(col("order_date"), "Z$", ""))
      val pdk = graft.ingest.Fanout.withPartitionKeys(
        graft.ingest.Fanout.productDetails(nested,
          passthrough = Seq("order_date")), isoTs)
        .drop("order_date", "day", "hour")
      noop(pdk)
      println("=== pd explode + keys + rebalance ===")
      noop(pdk.hint("rebalance", col("year"), col("month")))
      println("=== pd again (warm) ===")
      noop(pdk.hint("rebalance", col("year"), col("month")))
      println("=== addresses sink write ===")
      val sa = graft.ingest.Fanout.withPartitionKeys(
        graft.ingest.Fanout.shippingAddresses(nested,
          passthrough = Seq("order_date")), isoTs)
        .drop("order_date", "day", "hour")
      graft.ingest.PartitionedSink.write(sa,
        graft.Tables.freshScratchDir("catparts") + "/sa",
        Seq("country", "year", "month"))
    }
    Thread.sleep(1000)
    spark.stop()
  }
}
