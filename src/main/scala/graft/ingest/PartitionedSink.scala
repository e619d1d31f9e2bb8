package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Firehose→S3 dynamic-partitioning analog: parquet partitioned by the
  * derived time keys (`year/month/day/hour`, optionally a leading
  * attribute key like `country`).
  *
  * Scale notes (SURVEY §5): partition columns must stay low-cardinality —
  * the reference partitions orders by `customer_id/...` which at 100 TB
  * would create millions of tiny files; here high-cardinality keys are
  * demoted to `sortWithinPartitions` so they still cluster row-groups
  * (parquet min/max pruning) without exploding the file count.
  *
  * The frame is shuffled ON the partition columns before the write:
  * without it every upstream task opens a writer per partition value it
  * happens to hold (t tasks × p values → up to t·p splinter files — the
  * classic dynamic-partition-write mistake; at 32 tasks × 80 months the
  * roundtrip gate wrote ~2.5k files). After the shuffle each value's
  * rows are co-located, so a directory gets few well-sized files and
  * the downstream read opens ~p files, not t·p. The shuffle is a
  * REBALANCE hint, not `repartition(cols)`: AQE's skew splitting
  * (OptimizeSkewInRebalancePartitions) only applies to rebalance-origin
  * shuffles, so a hot partition value (one month holding 90% of rows)
  * is split across tasks instead of funneling through one — plain
  * repartition-by-column would recreate exactly the one-reducer shape
  * this repo's plan audit forbids.
  */
object PartitionedSink {

  def write(df: DataFrame, path: String,
      partitionCols: Seq[String],
      clusterCols: Seq[String] = Nil): Unit = {
    val colocated =
      if (partitionCols.isEmpty) df
      else df.hint("rebalance", partitionCols.map(col): _*)
    val clustered =
      if (clusterCols.isEmpty) colocated
      else colocated.sortWithinPartitions(
        clusterCols.head, clusterCols.tail: _*)
    clustered.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
