package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cold-JVM single-shot cost of the nested doc build under codegen
  * variants (round-15): the one-shot build lines burn 10-17× their
  * warm CPU, the signature of generated methods above HotSpot's
  * 8000-bytecode JIT ceiling (-XX:DontCompileHugeMethods, on by
  * default) running interpreted for every row. Spark's
  * `spark.sql.codegen.hugeMethodLimit` defaults to 65535, so such
  * stages are NOT falling back. Each run of this main is one cold JVM:
  * variant = argv(1) ∈ {default, huge8000, nocodegen}.
  */
object WarmupMicro {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val variant = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(4, cpus.toInt / 2).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
    variant match {
      case "huge8000" => b.config("spark.sql.codegen.hugeMethodLimit", "8000")
      case "nocodegen" => b.config("spark.sql.codegen.wholeStage", "false")
      case _ => ()
    }
    val spark = b.getOrCreate()
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
    def timed(name: String)(body: => Unit): Unit = {
      org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext)
      taskCpuNs.set(0L)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext)
      println(f"[warmup:$variant] $name%-28s wall=$wall%8.3f cpu=${taskCpuNs.get() / 1e9}%8.3f")
    }
    // warm base-table footers like Bench does, so the timed line is the
    // build, not session startup
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    timed("nested build one-shot") {
      graft.ingest.SyntheticOrders.nested(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    timed("wire encode one-shot") {
      graft.ingest.SyntheticOrders.wire(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    timed("decode one-shot") {
      graft.ingest.EventCodec.decode(graft.ingest.SyntheticOrders.wire(spark, sfDir))
        .select(col("order_id"), col("status"),
          round(col("purchaise_details.amount"), 4).as("amount"),
          size(col("product_details")).as("n_products"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("decode again (warm)") {
      graft.ingest.EventCodec.decode(graft.ingest.SyntheticOrders.wire(spark, sfDir))
        .select(col("order_id"), col("status"),
          round(col("purchaise_details.amount"), 4).as("amount"),
          size(col("product_details")).as("n_products"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
