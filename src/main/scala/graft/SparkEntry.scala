package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator registers a `queries` entry; every
  * ANSI-SQL-expressible one also registers a DuckDB oracle with identical
  * output column names + ORDER BY (the driver sorts columns by name and
  * hashes values, so aliases must match exactly on both sides).
  */
object SparkEntry {

  /** The §2 catalog, merged. Modules keep their QueryDefs next to the
    * operator code so Spark + oracle stay in sync.
    */
  private lazy val catalog: Map[String, QueryDef] =
    operators.RefQueries.defs ++
      operators.Relational.defs ++
      operators.Relational2.defs ++
      operators.Relational3.defs ++
      operators.Relational4.defs ++
      operators.TypedOps.defs ++
      operators.SqlSurface.defs ++
      operators.TpchMore.defs ++
      operators.TpchFull.defs ++
      operators.Skew.defs ++
      operators.Packing.defs ++
      operators.Maintenance.defs ++
      operators.Profiling.defs ++
      operators.TopKOps.defs ++
      operators.Diagnostics.defs ++
      operators.Cleaning.defs ++
      operators.Behavior.defs ++
      operators.TimeOps.defs ++
      operators.TimeOps.approxDefs ++
      ingest.IngestQueries.defs ++
      ingest.Export.defs ++
      text.CorpusStats.defs ++
      streaming.StreamQueries.defs ++
      dedup.Dedup.defs ++
      dedup.Dedup.evalDefs ++
      dedup.Clusters.defs ++
      similarity.Knn.defs ++
      similarity.Ivf.defs ++
      similarity.Quantize.defs ++
      similarity.VectorAnalytics.defs ++
      text.TextAnalysis.defs ++
      text.Pii.defs ++
      text.LexStats.defs ++
      text.Curate.defs ++
      text.Vocab.defs ++
      text.Contamination.defs ++
      text.CorpusIndex.defs ++
      text.Retrieval.defs ++
      multimodal.Multimodal.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog("ref_sales_by_country").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (k, v) => k -> v.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    catalog.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
