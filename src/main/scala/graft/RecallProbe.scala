package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade recall readout for the two approximating embedding
  * dispatchers (round-8 verdict item 2): the correctness gate proves
  * hash-equality to an oracle that REPLICATES the approximation, which
  * is self-consistency, not recall — this main measures recall against
  * the exact twin at whatever scale factor it is pointed at.
  *
  * `RecallProbe <sfDir> [knn|emb|all]`, prints one JSON line.
  *
  *  - knn: recall@3 of the budget-dispatched knn_graph (b signature
  *    bits of label sub-blocking, Knn.graphTopK) against the exact
  *    b = 0 label-block graph, on a 1/97 sampled query set. Sampling
  *    the QUERY side is exact, not approximate: the graph's rows for a
  *    query depend only on that query's (label, subkey) block, so the
  *    sampled rows are identical to the full run's — only the exact
  *    twin's cost (|sample| × label-block cosines) needed bounding.
  *  - emb: pair recall of the dedup_embedding hyperplane-LSH ladder
  *    rung the sf10 corpus selects — (2 tables × 16 bits) — against
  *    the exact label-blocked pairs at cos ≥ 0.99, on the seeded
  *    corpus sub-sampled on the ORIGINAL id % 20 (copies live at
  *    −(id+1), mapped back before sampling, so both endpoints of a
  *    planted pair survive together) and candidate
  *    membership is a pure pairwise function of the two signatures
  *    (the rung has no bucket cap), so the sampled recall is the
  *    population recall estimator with ~n/140 true-pair support.
  *
  * Both probes run the REAL operator code paths (Knn.graphTopK,
  * Dedup.embeddingPairsLsh / embeddingPairs-with-unbounded-budget) —
  * no reimplementation that could drift from what ships.
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val parts = scala.collection.mutable.ArrayBuffer[String]()

    if (which == "all" || which == "knn") {
      val e = Tables.embeddings(spark, sfDir)
      val qf = pmod(col("vec_id"), lit(97L)) === 0L
      // optional third arg: force the approx side's sub-block bit count
      // (the recall-vs-cost dial; omitted = the dispatcher's own b)
      val forcedB = if (args.length > 2) Some(args(2).toInt) else None
      val approx = graft.similarity.Knn
        .graphTopK(e, 3, queryFilter = Some(qf), forceB = forcedB)
        .select("vec_id", "neighbor_id")
        .persist()
      val exact = graft.similarity.Knn
        .graphTopK(e, 3, queryFilter = Some(qf), forceB = Some(0))
        .select("vec_id", "neighbor_id")
        .persist()
      val nExact = exact.count()
      val nCommon = exact
        .join(approx, Seq("vec_id", "neighbor_id"), "left_semi").count()
      val nQueries = exact.select("vec_id").distinct().count()
      parts += s""""knn_graph":{"n_queries":$nQueries,""" +
        s""""n_exact_edges":$nExact,"n_common":$nCommon,""" +
        s""""recall_at_3":${f"${nCommon.toDouble / math.max(nExact, 1)}%.4f"}}"""
      approx.unpersist(); exact.unpersist()
    }

    if (which == "all" || which == "emb") {
      // sample on the ORIGINAL id (copies live at −(id+1)) so a planted
      // pair always keeps or loses both endpoints together
      val origId = when(col("vec_id") < 0, -col("vec_id") - 1)
        .otherwise(col("vec_id"))
      val seeded = graft.dedup.Dedup
        .seededEmbeddings(Tables.embeddings(spark, sfDir))
        .filter(pmod(origId, lit(20L)) === 0L)
        .persist()
      // exact twin: the entry's own dispatcher with the budget removed
      // (Long.MaxValue keeps it on the lossless label-blocked branch)
      val exact = graft.dedup.Dedup
        .embeddingPairs(seeded, 0.99, pairBudget = Long.MaxValue)
        .select("vec_a", "vec_b").persist()
      // the rung the sf10 corpus selects on the full seeded table
      val lsh = graft.dedup.Dedup
        .embeddingPairsLsh(seeded, 0.99, tables = 2, bitsPerTable = 16)
        .select("vec_a", "vec_b")
      val nExact = exact.count()
      // LSH pairs are exact-cosine-verified, hence a subset of exact
      val nLsh = lsh.join(exact, Seq("vec_a", "vec_b"), "left_semi").count()
      parts += s""""dedup_embedding_2x16":{"n_exact_pairs":$nExact,""" +
        s""""n_lsh_pairs":$nLsh,""" +
        s""""pair_recall":${f"${nLsh.toDouble / math.max(nExact, 1)}%.4f"}}"""
      seeded.unpersist(); exact.unpersist()
    }

    spark.stop()
    println(s"""{"sf":"$sfDir",${parts.mkString(",")}}""")
  }
}
