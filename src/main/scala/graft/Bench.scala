package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every catalog query at SPARK_GRAFT_SF_DIR and
  * prints ONE compact JSON line as the process's final stdout output.
  *
  * The line is kept SHORT (headline per-query numbers only) because the
  * harness captures a bounded tail of stdout — round 1's full 78-query
  * line exceeded it and failed to parse. The complete per-query table is
  * written to BENCH_FULL.json instead.
  *
  * Failed queries are excluded from the reported total (a failure must
  * never make the benchmark look faster) and surface in "failures".
  */
object Bench {

  private val headline = Seq(
    "q1_agg", "q6_filter", "q5_region_revenue", "ref_top_products",
    "ref_sales_by_country", "window_funcs", "topk_per_group", "asof_join",
    "range_join", "sessionize", "fanout_products", "ingest_decode",
    "dedup_exact", "dedup_ngram", "dedup_minhash", "dedup_clusters",
    "knn_brute", "knn_custom", "knn_ivf", "curate_keep", "quality_score",
    "token_count")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle width decoupled from thread count: local-mode task-launch
    // overhead dominates at test SFs, so fewer-but-fuller reducers win;
    // on a real cluster this would be 2-3x executor cores instead
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.max(4, cpus.toInt / 2).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM + parquet footer caches so the first timed query
    // doesn't absorb session startup
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val elapsed =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      name -> elapsed
    }
    def fmt(v: Double) = f"$v%.3f"
    def jsonMap(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val failed = results.filter(_._2 < 0)
    val total = ok.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""n_queries":${results.size},"failures":${failed.size},""" +
        s""""queries":${jsonMap(results.filter(r => headline.contains(r._1)))},""" +
        s""""sf":"$sfDir"}"""
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""failures":${failed.map(f => "\"" + f._1 + "\"").mkString("[", ",", "]")},""" +
        s""""queries":${jsonMap(results)},"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (full + "\n").getBytes("UTF-8"))
    spark.stop()
    // final stdout line — after stop() so no Spark logging can interleave
    println(line)
  }
}
