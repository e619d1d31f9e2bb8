package graft.ingest

import org.apache.spark.sql.SparkSession

/** Small-file compaction: streaming sinks (like Firehose's buffer
  * flushes) accumulate many small parquet files per partition; scans
  * then pay per-file open cost and lose row-group locality. Compaction
  * rewrites a directory to ~`targetBytes` files, preserving an optional
  * cluster column so min/max row-group pruning keeps working.
  *
  * At 100 TB this runs per partition directory (year=/month=/...),
  * idempotently, as a maintenance job.
  */
object Compaction {

  def compact(spark: SparkSession, dir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Nil): Long = {
    // size the input via the Hadoop FileSystem API so the same code
    // works on distributed storage (HDFS/S3), not just local paths
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    var inputBytes = 0L
    val files = fs.listFiles(path, /* recursive = */ true)
    while (files.hasNext) {
      val f = files.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) inputBytes += f.getLen
    }
    val df = spark.read.parquet(dir)
    val nFiles = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    val arranged =
      if (clusterBy.isEmpty) df.repartition(nFiles)
      else df.repartition(nFiles)
        .sortWithinPartitions(clusterBy.head, clusterBy.tail: _*)
    arranged.write.mode("overwrite").parquet(outDir)
    nFiles.toLong
  }
}
