package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** NN-descent list-width sweep (round-10 verdict item 1 calibration):
  * for each kInternal in a comma-separated list, build the FORCED
  * NN-descent graph (bypassing the exact-path budget dispatch) on the
  * given corpus and report wall seconds, edge count, a deterministic
  * whole-graph hash, and recall@3 against the exact within-label twin
  * on the 1/97 query sample (the RecallProbe sample geometry; the twin
  * is computed once and reused across K points).
  *
  * `KSweep <sfDir> <k1,k2,...>` — prints one JSON line.
  *
  * The graph hash doubles as the merge-rewrite equivalence gate
  * (round-10 verdict item 4): the window-merge and aggregate-merge
  * formulations must produce the IDENTICAL graph, so running this main
  * on both builds at the same K must print the same graph_hash.
  */
object KSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ks = args(1).split(",").map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "60s")
      // the bounded-heap top-k aggregates keep thousands of tiny
      // per-group buffers; the default sort-based fallback (128
      // groups/task) would external-sort the full scored-pair input —
      // measured 150 GB of sort insert at the 2M-vector twin. Buffers
      // are O(k) values each, so holding ~10^4-10^5 groups per task in
      // the hash map is kilobytes-per-group cheap (see Bench/Verify).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      // embeddings-only corpora are one ~0.5 GB parquet dir; the
      // default 128 MB split gives the scoring join 4 scan tasks on a
      // 32-thread box — split finer so the map-side cosine stage uses
      // the machine
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, sfDir)
    val qf = pmod(col("vec_id"), lit(97L)) === 0L
    val exact = graft.similarity.Knn
      .exactLabelGraph(e, 3, queryFilter = Some(qf))
      .select("vec_id", "neighbor_id").persist()
    val nExact = exact.count()

    val entries = ks.map { k =>
      val t0 = System.nanoTime()
      val g = graft.similarity.NnDescent.knnGraph(e, 3, kInternal = k)
      // xor-fold, not sum: ANSI mode makes a long sum of 2^63-scale
      // hashes throw on overflow; rows are unique so xor can't cancel
      val stat = g.agg(count(lit(1)).as("n"),
        bit_xor(xxhash64(col("vec_id"), col("rank"), col("neighbor_id"),
          col("cosine"))).as("h")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      val hits = exact.join(g.filter(qf).select("vec_id", "neighbor_id"),
        Seq("vec_id", "neighbor_id"), "left_semi").count()
      g.unpersist(blocking = false)
      val recall = hits.toDouble / math.max(nExact, 1L)
      System.err.println(f"[ksweep] k=$k wall=$wall%.1f recall=$recall%.4f")
      s""""k$k":{"k_internal":$k,"wall_sec":${f"$wall%.1f"},""" +
        s""""n_edges":${stat.getLong(0)},"graph_hash":${stat.getLong(1)},""" +
        s""""recall_at_3":${f"$recall%.4f"}}"""
    }
    spark.stop()
    println(s"""{"sf":"$sfDir","n_exact_sample_edges":$nExact,""" +
      entries.mkString(",") + "}")
  }
}
