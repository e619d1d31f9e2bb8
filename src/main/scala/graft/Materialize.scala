package graft

import org.apache.spark.sql.DataFrame

/** Lineage-cutting materialization with a config-gated RELIABLE path
  * (round-16 verdict item 8: the cluster-safety story for every
  * localCheckpoint site).
  *
  * Default: `localCheckpoint` — executor-local UnsafeRow blocks, no
  * columnar conversion, partition layout preserved. This is the right
  * storage for the single-machine driver harness (measured round 15:
  * the columnar persist cost ~10× on array<struct> payloads), but it is
  * a LOCAL-MODE ASSUMPTION when taken to a cluster: the blocks live
  * only on the executors that computed them, so one lost executor
  * (dynamic allocation scale-in, spot kill) makes every downstream
  * consumer of the frame fail unrecoverably — the lineage needed to
  * recompute the lost partitions was truncated.
  *
  * Cluster deployments set `spark.graft.reliableCheckpointDir` to a
  * fault-tolerant location (HDFS/S3); every cut then goes through
  * `Dataset.checkpoint` into that directory instead, which survives
  * executor loss at the cost of one distributed write + read. The knob
  * is a runtime session conf so the same binary serves both shapes;
  * correctness is identical either way (both cuts materialize the same
  * rows — only the storage and recovery story change).
  */
object Materialize {

  private val ReliableDirKey = "spark.graft.reliableCheckpointDir"

  /** Materialize `df` and truncate its lineage. `eager = false` defers
    * the job to the first action (used by iterative loops that overlay
    * several cuts into one pass).
    */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ReliableDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir creates a unique subdirectory per context;
        // only (re)set it when unset or pointed elsewhere so repeated
        // cuts share one directory tree.
        if (!sc.getCheckpointDir.exists(_.contains(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }

  /** Chaining syntax: `df.cutLineage()` ≡ `Materialize.cut(df)`, so
    * call sites read like the `localCheckpoint` they replace.
    */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(eager: Boolean = true): DataFrame = cut(df, eager)
  }
}
