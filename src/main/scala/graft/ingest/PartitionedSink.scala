package graft.ingest

import org.apache.spark.sql.DataFrame

/** Firehose→S3 dynamic-partitioning analog: parquet partitioned by the
  * derived time keys (`year/month/day/hour`, optionally a leading
  * attribute key like `country`).
  *
  * Scale notes (SURVEY §5): partition columns must stay low-cardinality —
  * the reference partitions orders by `customer_id/...` which at 100 TB
  * would create millions of tiny files; here high-cardinality keys are
  * demoted to `sortWithinPartitions` so they still cluster row-groups
  * (parquet min/max pruning) without exploding the file count.
  */
object PartitionedSink {

  def write(df: DataFrame, path: String,
      partitionCols: Seq[String],
      clusterCols: Seq[String] = Nil): Unit = {
    val clustered =
      if (clusterCols.isEmpty) df
      else df.sortWithinPartitions(clusterCols.head, clusterCols.tail: _*)
    clustered.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
