package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 §4 evidence: the ranged global-order layouts materialize
  * EAGERLY (Materialize.cut inside withGlobalIndex/withGlobalPrefixSums),
  * so the final query plans only show `Scan ExistingRDD` — the width
  * change is invisible in plan dumps. This main prints the ACTUAL
  * partition count of each ranged layout (the materialized frame's RDD
  * partition count) for the rfm metric frame, the corpus-shuffle frame
  * and the ks_drift cumsum frame, so the "AQE coalesces small frames
  * narrow" claim is a committed measurement.
  *
  * Usage: runMain graft.tools.RangedWidthProbe <sfDir>
  */
object RangedWidthProbe {

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
    println(s"[rangedwidth] cpus=$cpus defaultParallelism=" +
      s"${spark.sparkContext.defaultParallelism} shuffle.partitions=" +
      spark.conf.get("spark.sql.shuffle.partitions"))

    def probe(name: String, df: org.apache.spark.sql.DataFrame,
        sortCols: Seq[String]): Unit = {
      val n = df.count()
      val ranged = graft.Materialize.cut(
        df.repartitionByRange(sortCols.map(col): _*)
          .withColumn("_pid", spark_partition_id()))
      println(s"[rangedwidth] $name rows=$n " +
        s"ranged_partitions=${ranged.rdd.getNumPartitions} " +
        s"(round-15 width was max(8, defaultParallelism))")
    }

    val rfm = graft.Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(max("ts").as("last_ts"), count(lit(1)).as("freq"),
        round(sum("value"), 4).as("monetary"))
    probe("rfm_metric_frame", rfm, Seq("last_ts", "user_id"))

    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("h",
        md5(concat(col("doc_id").cast("string"), lit(":shuffle"))
          .cast("binary")))
      .select("doc_id", "h")
    probe("corpus_shuffle_frame", docs, Seq("h"))

    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
    probe("global_rownum_frame", orders, Seq("o_orderkey"))

    spark.stop()
  }
}
