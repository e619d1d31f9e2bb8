package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade recall readout for the two approximating embedding
  * dispatchers (round-8 verdict item 2): the correctness gate proves
  * hash-equality to an oracle that REPLICATES the approximation, which
  * is self-consistency, not recall — this main measures recall against
  * the exact twin at whatever scale factor it is pointed at.
  *
  * `RecallProbe <sfDir> [knn|emb|cont|all]`, prints one JSON line.
  *
  *  - knn: recall@3 of the budget-dispatched knn_graph (exact below
  *    budget, NN-descent above — Knn.graphTopK) against the exact
  *    label-block graph, on a 1/97 sampled query set. The approx side
  *    builds the FULL graph (NN-descent is global by nature) and is
  *    filtered to the sample; the exact twin restricts its query side
  *    up front (exact, not approximate: a query's rows depend only on
  *    its own label block), bounding its cost to |sample| ×
  *    label-block cosines.
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
      // see Bench.scala: keep the bounded-heap aggregates on the hash
      // path instead of the 128-group sort-based fallback
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val parts = scala.collection.mutable.ArrayBuffer[String]()

    if (which == "all" || which == "knn") {
      val e = Tables.embeddings(spark, sfDir)
      val qf = pmod(col("vec_id"), lit(97L)) === 0L
      // optional third arg: override NN-descent's internal list width
      // (the K-sweep dial; omitted/0 = the production auto-scaled
      // width, Knn.autoKInternal)
      val kInt = if (args.length > 2) args(2).toInt else 0
      val approx = graft.similarity.Knn
        .graphTopK(e, 3, kInternal = kInt)
        .filter(qf)
        .select("vec_id", "neighbor_id")
        .persist()
      val exact = graft.similarity.Knn
        .exactLabelGraph(e, 3, queryFilter = Some(qf))
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

    // Containment recall with planted parents, two plant geometries
    // (round-10 verdict items: contiguous = round-9 item 5; scattered =
    // round-10 item 5). `interleave = false` builds each parent as the
    // CONCATENATION of r consecutive sampled docs (every member's
    // shingle set is a subset — the quote/boilerplate-inclusion case
    // the window grid was built for). `interleave = true` builds the
    // parent by ROUND-ROBIN INTERLEAVING 16-token chunks of the r
    // members — each member's content is strewn through the parent in
    // ⌈len/16⌉ non-contiguous spans, so no 32-token window of the
    // parent is dominated by one member and the window-grid signatures
    // see only mixtures (the documented residual the contract points
    // at the exact path for). Chunk cuts cost ~2 boundary shingles
    // each, so most members still exceed the 0.8 hot-filtered truth
    // threshold the probe qualifies against — the truth CTE decides.
    def contProbe(interleave: Boolean, outKey: String): Unit = {
      // Deep-asymmetry containment recall (round-9 verdict item 5):
      // plant snippet docs that are PREFIXES of sampled corpus docs at
      // size ratios R ∈ {2, 5, 10} (containment(snippet ⊆ parent) = 1
      // by construction), run the ABOVE-BUDGET LSH branch
      // (containmentPairsLsh, the plan the dense decade selects), and
      // report per-R recall of the planted directed pairs. Ground
      // truth respects the shared hot-filter contract: a planted pair
      // counts only if its HOT-FILTERED containment clears the 0.8
      // threshold (the exact branch would drop it identically
      // otherwise). Planted ids are negative (never collide with
      // GenScale's +c·1e8 copy strides).
      // corpus docs are 10-100 tokens, so snippets can't be carved out
      // of them; invert the construction instead — plant LARGE docs as
      // concatenations of r consecutive sampled docs. Every member's
      // shingle set is then a SUBSET of the planted doc's (containment
      // 1.0 by construction; junction shingles only grow the large
      // side), and the member→large size ratio R̂ = nb/na spans the
      // decades as r and the member length vary. Recall is reported
      // bucketed by measured R̂ ∈ [1,3) / [3,7) / [7,∞).
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      val sampled = docs
        .filter(pmod(col("doc_id"), lit(101L)) === 0L)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("doc_id")) - 1)
      val groups = Seq(2, 5, 10)
      val larges = groups.map { r =>
        val base = sampled.withColumn("grp", (col("rn") / r).cast("long"))
        val built =
          if (!interleave)
            base.groupBy("grp")
              .agg(concat_ws(" ",
                transform(array_sort(collect_list(struct(col("rn"),
                  col("text")))), p => p.getField("text"))).as("text"),
                count(lit(1)).as("members"))
          else
            base
              .select(col("grp"), col("rn"),
                posexplode(split(trim(col("text")), "\\s+")))
              .select(col("grp"), col("rn"),
                (col("pos") / 16).cast("long").as("chunk"),
                col("pos"), col("col").as("tok"))
              .groupBy("grp")
              .agg(concat_ws(" ",
                transform(array_sort(collect_list(struct(col("chunk"),
                  col("rn"), col("pos"), col("tok")))),
                  p => p.getField("tok"))).as("text"),
                count_distinct(col("rn")).as("members"))
        built
          .filter(col("members") === r)
          .select((-(lit(r.toLong) * 10000000L + col("grp")) - 1L)
            .as("doc_id"), col("text"), lit(r).as("r"), col("grp"))
      }.reduce(_ unionByName _).persist()
      val planted = groups.map { r =>
        sampled
          .withColumn("grp", (col("rn") / r).cast("long"))
          .select(col("doc_id").as("sid"),
            (-(lit(r.toLong) * 10000000L + col("grp")) - 1L)
              .as("parent_id"))
      }.reduce(_ unionByName _)
        .join(larges.select(col("doc_id").as("parent_id")), "parent_id")
        .persist()
      val corpus = docs.unionByName(larges.select("doc_id", "text"))
        .persist()
      val found = graft.dedup.Dedup
        .containmentPairsLsh(corpus, 0.8)
        .select(col("doc_a"), col("doc_b")).persist()
      found.count()
      // hot-filtered truth + measured size ratio: a planted pair
      // qualifies iff filtered common / member's PRE-cap n >= 0.8
      // (the branch contract — the exact branch would drop it
      // identically otherwise)
      val post = graft.dedup.Dedup.postings(corpus)
      val hot = graft.dedup.Dedup.hotShingles(corpus, postingsSet = Some(post))
      val postF = post.join(hot, Seq("s"), "left_anti")
      val sizes = post.groupBy("doc_id").agg(first(col("n")).as("n"))
      val snipPost = postF
        .join(planted, col("doc_id") === col("sid"))
        .select(col("sid"), col("parent_id"), col("s"))
      val parPost = postF.select(col("doc_id").as("pid"), col("s").as("ps"))
      val common = snipPost
        .join(parPost,
          col("parent_id") === col("pid") && col("s") === col("ps"))
        .groupBy("sid", "parent_id")
        .agg(count(lit(1)).as("common"))
      val truth = planted
        .join(sizes.select(col("doc_id").as("sid"), col("n").as("na")),
          "sid")
        .join(sizes.select(col("doc_id").as("parent_id"),
          col("n").as("nb")), "parent_id")
        .join(common, Seq("sid", "parent_id"), "left")
        .filter(coalesce(col("common"), lit(0L)) * lit(1.0) / col("na")
          >= 0.8)
        .withColumn("rbucket",
          when(col("nb") < col("na") * 3, "R1to3")
            .when(col("nb") < col("na") * 7, "R3to7")
            .otherwise("R7plus"))
      val perR = truth
        .join(found, truth("sid") === found("doc_a") &&
          truth("parent_id") === found("doc_b"), "left")
        .groupBy("rbucket")
        .agg(count(lit(1)).as("n_true"),
          count(col("doc_a")).as("n_found"))
        .orderBy("rbucket").collect()
      val rJson = perR.map { row =>
        val (rb, nt, nf) =
          (row.getString(0), row.getLong(1), row.getLong(2))
        s""""$rb":{"n_true":$nt,"n_found":$nf,""" +
          s""""recall":${f"${nf.toDouble / math.max(nt, 1)}%.4f"}}"""
      }.mkString(",")
      parts += s""""$outKey":{$rJson}"""
      larges.unpersist(); planted.unpersist(); corpus.unpersist()
      found.unpersist()
    }
    if (which == "all" || which == "cont")
      contProbe(interleave = false, "containment_lsh")
    if (which == "all" || which == "scat")
      contProbe(interleave = true, "containment_scattered")

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
