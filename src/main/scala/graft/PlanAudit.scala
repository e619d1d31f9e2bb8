package graft

/** Plan-quality audit (SURVEY §5): checks each catalog query's physical
  * plan for the scale-critical properties — filter pushdown, column
  * pruning, broadcast of dim sides, whole-stage codegen coverage — and
  * prints a one-line report per query. Run: `sbt "runMain graft.PlanAudit"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // materialize THIS queryExecution so AQE finalizes
        val plan = df.queryExecution.executedPlan.toString
        val scans = "Scan parquet".r.findAllIn(plan).size
        val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
        val bcast = "BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(plan).size
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        // codegen'd operators carry a `*(stageId)` prefix in the simple
        // plan string; count distinct codegen stage ids
        val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
        val exch = "Exchange".r.findAllIn(plan).size
        // full-width scans (ReadSchema listing every column) are flagged
        // by counting scans that read >8 cols
        val wide = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
          .count(_.group(1).split(",").length > 8)
        println(f"$name%-22s scans=$scans pushed=$pushed bcast=$bcast smj=$smj codegen=$wsc exchange=$exch wide=$wide")
      } catch { case e: Throwable => println(s"$name AUDIT-ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
