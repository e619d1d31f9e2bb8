package graft.tools

/** Micro-batch cost breakdown for the streaming catalog entries
  * (round-15 guide §1 "measure first"): registers a
  * StreamingQueryListener that prints every progress event's
  * durationMs map (addBatch / getBatch / latestOffset / queryPlanning /
  * walCommit / commitOffsets), then runs the named entries through the
  * normal catalog fns. Wall >> task CPU on these entries and the task
  * metrics can't say where driver-side micro-batch machinery spends it
  * — this can.
  *
  * Usage: runMain graft.tools.StreamProf <sfDir> q1 q2 ...
  */
object StreamProf {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        math.max(4, cpus.toInt / 2).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent)
            : Unit =
          println(s"[streamprof] started ${e.name} at ${System.nanoTime() / 1000000} ms")
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent)
            : Unit = {
          val p = e.progress
          println(s"[streamprof] ${p.name} batch=${p.batchId} " +
            s"rows=${p.numInputRows} durationMs=${p.durationMs} " +
            s"state=${Option(p.stateOperators).map(_.length).getOrElse(0)}")
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent)
            : Unit =
          println(s"[streamprof] terminated ${e.id} at ${System.nanoTime() / 1000000} ms")
      })
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[streamprof] $name total ${(System.nanoTime() - t0) / 1e9}%.3f s")
      } catch { case e: Throwable =>
        println(s"[streamprof] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
