package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.Materialize.CutOps

/** Duplicate-cluster resolution: near-dup PAIRS are not enough — a
  * curation pipeline needs transitive components (a~b, b~c ⇒ {a,b,c})
  * with one kept representative per cluster. Implemented as iterative
  * min-label propagation WITH pointer shortcutting: each round a vertex
  * takes the min over its own label, its neighbors' labels, and its
  * label's label (label-of-label, i.e. path halving). The shortcut step
  * halves remaining chain depth per round, so rounds grow with
  * log2(largest component diameter) — not with the diameter itself as
  * plain hash-min would — and the same loop runs at 100 TB.
  *
  * The driver-side loop only checks a changed-count per round (a scalar
  * aggregate) — no data is collected. Non-convergence within `maxIter`
  * throws rather than silently emitting wrong representatives.
  */
object Clusters {

  /** edges(src,dst) → (doc_id, cluster_rep = min id reachable). Only
    * vertices that appear in an edge are returned.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    // materialize the edge list ONCE — every round joins against it, and
    // without this the whole upstream pipeline (e.g. the shingle pair
    // join) would re-execute per iteration
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cutLineage()
    // seed labels with min(id, min neighbor) — the first propagation
    // round folded into initialization. LAZY checkpoint: the first
    // convergence probe below is the materializing action, so seeding
    // costs one job, not materialize + probe.
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("_mn"))
      .select(col("id"), least(col("id"), col("_mn")).as("label"))
      .cutLineage()
    // labels only ever DECREASE, so the label sum is strictly monotone:
    // equal sums between rounds ⇔ fixpoint. Decimal accumulator — a
    // 100 TB id space would overflow a long sum.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // sum over an empty frame is null — a corpus with zero near-dup
      // pairs must fall through to "converged", not NPE
      val s = df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor labels flow along edges; keep the minimum seen
      val viaEdges = sym
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"))
      // pointer shortcut: id -> label(label(id)). One extra self-join
      // per round buys O(log d) total rounds instead of O(d).
      val viaPtr = labels.as("l")
        .join(labels.as("m"), col("l.label") === col("m.id"))
        .select(col("l.id").as("id"), col("m.label").as("label"))
      // LAZY checkpoint, materialized by the convergence probe: the
      // probe's aggregate job computes `next` once and caches its
      // blocks; the following round's joins read the cache. One job
      // per round instead of eager-materialize + probe (the eager
      // variant doubled the loop's job count for no extra safety —
      // the probe always runs immediately after).
      val next = labels.select(col("id"), col("label"))
        .union(viaEdges)
        .union(viaPtr)
        .groupBy("id").agg(min("label").as("label"))
        .cutLineage()
      val newSum = labelSum(next)
      labels = next
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds 2^rounds; raise maxIter")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_rep"))
  }

  /** Cluster labels over the shared near-dup pair graph
    * ([[Dedup.sharedPairs]]) as a memoized corpus asset: four catalog
    * entries (dedup_clusters, dedup_canonical, curate_keep,
    * train_manifest) need the same label assignment, and the CC loop's
    * per-round jobs are the most expensive recomputation in the gate
    * path. The final labels frame is already localCheckpoint-
    * materialized by the loop, so the memo only pins the reference.
    * Bounded keyed AssetMemo (locking/eviction/invariant documented
    * there); Bench reports the build as its own `shared_labels_build`
    * line.
    */
  private val labelsMemo = new graft.AssetMemo(8)

  def sharedLabels(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    labelsMemo.getOrBuild(s, d) {
      connectedComponents(
        Dedup.sharedPairs(s, d)
          .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    }

  /** Fixed-iteration PageRank over an undirected edge list — the
    * link-authority score a web-corpus curation pipeline ranks documents
    * by before sampling. Each round is one edge-keyed shuffle join plus
    * a destination-keyed aggregate; ranks are localCheckpoint'ed per
    * round (the same lineage discipline as the CC loop) so round k+1
    * never re-executes round k. The symmetric graph has no dangling
    * nodes (every vertex has degree ≥ 1), so mass is conserved without
    * a driver-side redistribution term.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cutLineage()
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      .cutLineage()
    // n is a scalar aggregate (node count), not a data collect
    val n = deg.count()
    var ranks = deg.select(col("src").as("id"), lit(1.0 / n).as("score"))
    for (_ <- 1 to iters) {
      val contrib = sym
        .join(deg, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("score") / col("deg")).as("c"))
      ranks = contrib.groupBy("id").agg(sum("c").as("s"))
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) * col("s")).as("score"))
        .cutLineage()
    }
    ranks
  }

  /** Shared construction for D64 (`cc_incremental`) and its
    * invariants gate (`cc_inc_invariants`): the incremental update
    * graph and its closure, returned as (labels, updateEdges,
    * baseLabels) so the invariants key checks properties of the SAME
    * frames the gated output is built from. See the `cc_incremental`
    * entry's comment for the full oracle-contract story.
    */
  private[graft] def ccIncrementalGraph(
      s: org.apache.spark.sql.SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d)
        val isBatch = pmod(col("doc_id"), lit(10L)) === 0L
        val base = docs.filter(!isBatch)
        val batch = docs.filter(isBatch)
        // The postings table is the precomputed index state: the SHARED
        // corpus asset (tokenized once per corpus snapshot, persisted),
        // sliced by doc_id — the probe, the batch pairing, and the hot
        // set all read it instead of re-shingling the corpus per pass
        // (tokenize+explode passes collapse to 1, amortized across
        // every n-gram dedup entry in the session).
        val post = Dedup.sharedPostings(s, d)
        val basePost = Some(post.filter(pmod(col("doc_id"), lit(10L)) =!= 0L))
        val batchPost = Some(post.filter(pmod(col("doc_id"), lit(10L)) === 0L))
        // materialized once: three consumers, and the set is tiny by
        // construction (only above-cap shingles survive)
        val hotAll = Some(Dedup.hotShingles(docs,
          postingsSet = Some(post)).cutLineage())
        val baseLabels = connectedComponents(
          Dedup.sharedPairs(s, d)
            .filter(pmod(col("doc_a"), lit(10L)) =!= 0L &&
              pmod(col("doc_b"), lit(10L)) =!= 0L)
            .select(col("doc_a").as("src"), col("doc_b").as("dst")))
        val crossEdges = Dedup.ngramJaccardProbe(base, batch, 0.5,
            hotSet = hotAll, basePostings = basePost,
            incomingPostings = batchPost)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        val batchEdges = Dedup.ngramJaccardPairs(batch, 0.5,
            hotSet = hotAll, postingsSet = batchPost)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        val labelEdges = baseLabels
          .select(col("doc_id").as("src"), col("cluster_rep").as("dst"))
        // materialize the update graph ONCE: both the CC run and the
        // vertex filter below consume it, and without this the probe
        // and batch shingle joins would re-execute for the filter
        val updateEdges = labelEdges
          .unionByName(crossEdges).unionByName(batchEdges)
          .cutLineage()
        val labels = connectedComponents(updateEdges)
          // label self-edges (singleton base clusters) make their vertex
          // edge-incident even when the full recompute would not emit
          // it; keep only vertices a full pairing would return (cross/
          // batch pairs are strict doc_a < doc_b, so src =!= dst only
          // drops the label self-loops)
          .join(
            updateEdges.filter(col("src") =!= col("dst"))
              .select(explode(array(col("src"), col("dst"))).as("doc_id"))
              .distinct(),
            "doc_id")
        (labels, updateEdges, baseLabels)
  }

  /** Branch-split DuckDB oracle for D64 — equality vs the
    * from-scratch closure below the pair budget, incremental-
    * construction replica above (see the key's comment).
    */
  private[graft] val ccIncrementalOracle: String =
    """WITH RECURSIVE
         """ + Dedup.MurmurSql.pairGraphChainSql + """,
         fpairs AS (SELECT * FROM pairs
                    WHERE (SELECT v FROM pspent) <= 1000000000),
         fsym AS MATERIALIZED (
           SELECT doc_a AS a, doc_b AS b FROM fpairs
           UNION SELECT doc_b, doc_a FROM fpairs
           UNION SELECT doc_a, doc_a FROM fpairs
           UNION SELECT doc_b, doc_b FROM fpairs),
         freach(a, b) AS (
           SELECT a, b FROM fsym
           UNION
           SELECT r.a, s.b FROM freach r JOIN fsym s ON r.b = s.a),
         fout AS (SELECT a AS doc_id, min(b) AS cluster_rep
                  FROM freach GROUP BY a),
         lpairs AS (SELECT * FROM pairs
                    WHERE (SELECT v FROM pspent) > 1000000000),
         bpairs AS (SELECT doc_a, doc_b FROM lpairs
                    WHERE doc_a % 10 <> 0 AND doc_b % 10 <> 0),
         bsym AS MATERIALIZED (
           SELECT doc_a AS a, doc_b AS b FROM bpairs
           UNION SELECT doc_b, doc_a FROM bpairs
           UNION SELECT doc_a, doc_a FROM bpairs
           UNION SELECT doc_b, doc_b FROM bpairs),
         breach(a, b) AS (
           SELECT a, b FROM bsym
           UNION
           SELECT r.a, s.b FROM breach r JOIN bsym s ON r.b = s.a),
         blabels AS (SELECT a AS doc_id, min(b) AS rep
                     FROM breach GROUP BY a),
         -- pexf is source-guarded EMPTY above budget; the probe needs
         -- the hot-filtered postings exactly there, oppositely guarded
         ipexf AS MATERIALIZED (
           SELECT * FROM pex WHERE s NOT IN (SELECT s FROM phot)
             AND (SELECT v FROM pspent) > 1000000000),
         ibase AS (SELECT * FROM ipexf WHERE doc_id % 10 <> 0),
         ibatch AS (SELECT * FROM ipexf WHERE doc_id % 10 = 0),
         icross AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common,
                  any_value(a.n) AS na, any_value(b.n) AS nb
           FROM ibase a JOIN ibatch b ON a.s = b.s
             AND a.n * 0.5 <= b.n AND b.n * 0.5 <= a.n
           GROUP BY 1, 2),
         icrossp AS (SELECT doc_a, doc_b FROM icross
                     WHERE common * 1.0 / (na + nb - common) >= 0.5),
         ibb AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common,
                  any_value(a.n) AS na, any_value(b.n) AS nb
           FROM ibatch a JOIN ibatch b ON a.s = b.s
             AND a.doc_id < b.doc_id
             AND a.n * 0.5 <= b.n AND b.n * 0.5 <= a.n
           GROUP BY 1, 2),
         ibatchp AS (SELECT doc_a, doc_b FROM ibb
                     WHERE common * 1.0 / (na + nb - common) >= 0.5),
         iedges AS MATERIALIZED (
           SELECT doc_id AS src, rep AS dst FROM blabels
           UNION ALL SELECT doc_a, doc_b FROM icrossp
           UNION ALL SELECT doc_a, doc_b FROM ibatchp),
         isym AS MATERIALIZED (
           SELECT src AS a, dst AS b FROM iedges
           UNION SELECT dst, src FROM iedges
           UNION SELECT src, src FROM iedges
           UNION SELECT dst, dst FROM iedges),
         ireach(a, b) AS (
           SELECT a, b FROM isym
           UNION
           SELECT r.a, s.b FROM ireach r JOIN isym s ON r.b = s.a),
         iclu AS (SELECT a AS doc_id, min(b) AS cluster_rep
                  FROM ireach GROUP BY a),
         ivert AS (SELECT DISTINCT v AS doc_id FROM (
             SELECT src AS v FROM iedges WHERE src <> dst
             UNION ALL SELECT dst FROM iedges WHERE src <> dst)),
         iout AS (SELECT c.doc_id, c.cluster_rep
                  FROM iclu c JOIN ivert USING (doc_id))
         SELECT * FROM (SELECT * FROM fout UNION ALL SELECT * FROM iout)
         ORDER BY doc_id"""

  val defs: Map[String, QueryDef] = Map(

    // D14 — dedup clusters over the n-gram near-dup graph: every doc in
    // a duplicate cluster mapped to its representative (min doc_id).
    // Oracle: transitive closure via recursive CTE — an independent
    // formulation of the same fixpoint, over the SHARED dispatched
    // pair-graph fragment (Dedup.MurmurSql.pairGraphChainSql): the
    // closure follows whichever pair plan — lossless index or
    // budget-bounded LSH — the Σ df·(df−1) rule selects, exactly as
    // the engine's sharedPairs does.
    "dedup_clusters" -> QueryDef(
      (s, d) =>
        sharedLabels(s, d)
          .orderBy("doc_id"),
      """WITH RECURSIVE
         """ + Dedup.MurmurSql.pairGraphChainSql + """,
         sym AS MATERIALIZED (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs
           UNION SELECT doc_a, doc_a FROM pairs
           UNION SELECT doc_b, doc_b FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
         SELECT a AS doc_id, min(b) AS cluster_rep
         FROM reach GROUP BY a ORDER BY doc_id"""),

    // D92 — duplicate-cluster SIZE histogram: how many clusters have
    // 2 members, 3, … — the shape that decides dedup strategy at the
    // corpus level. A long tail of pairs is normal crawl duplication;
    // ONE mega-cluster is a template/mirror pathology that keep-first
    // representative selection handles badly (the rep itself is
    // boilerplate) and that inflates every pairwise pass downstream —
    // this histogram is where it becomes visible before any of that
    // runs. Reads the shared label asset; two dup-bounded aggregates
    // (cluster_rep collapse, then size collapse) — nothing here is
    // corpus-proportional beyond the label frame itself.
    "cluster_size_hist" -> QueryDef(
      (s, d) =>
        sharedLabels(s, d)
          .groupBy("cluster_rep")
          .agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"))
          .orderBy("cluster_size"),
      """WITH RECURSIVE
         """ + Dedup.MurmurSql.pairGraphChainSql + """,
         sym AS MATERIALIZED (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs
           UNION SELECT doc_a, doc_a FROM pairs
           UNION SELECT doc_b, doc_b FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         comp AS (SELECT a AS doc_id, min(b) AS rep FROM reach GROUP BY a),
         csz AS (SELECT rep, count(*) AS cluster_size FROM comp GROUP BY rep)
         SELECT cluster_size, count(*) AS n_clusters
         FROM csz GROUP BY cluster_size ORDER BY cluster_size"""),

    // D14b — canonical-representative selection: after clustering, a
    // curation pipeline keeps ONE doc per near-dup cluster — the
    // highest-quality member (here: longest text, ties to the smallest
    // id), not an arbitrary one. The per-cluster argmax is a window
    // over cluster_rep: clusters are near-dup groups and therefore
    // small, so the partition-by never sees a skewed key the way a
    // global sort would. Oracle: the same recursive-CTE closure as
    // dedup_clusters, extended with the argmax window.
    "dedup_canonical" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val labels = sharedLabels(s, d)
        val w = Window.partitionBy("cluster_rep")
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        labels
          .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
          .withColumn("rn", row_number().over(w))
          .withColumn("cluster_size",
            count(lit(1)).over(Window.partitionBy("cluster_rep")))
          .filter(col("rn") === 1)
          .select(col("cluster_rep"), col("doc_id").as("keep_doc"),
            col("n_chars").as("keep_chars"), col("cluster_size"))
          .orderBy("cluster_rep")
      },
      """WITH RECURSIVE
         """ + Dedup.MurmurSql.pairGraphChainSql + """,
         sym AS MATERIALIZED (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs
           UNION SELECT doc_a, doc_a FROM pairs
           UNION SELECT doc_b, doc_b FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         labels AS (
           SELECT a AS doc_id, min(b) AS cluster_rep
           FROM reach GROUP BY a),
         ranked AS (
           SELECT l.cluster_rep, l.doc_id, d.n_chars,
                  row_number() OVER
                    (PARTITION BY l.cluster_rep
                     ORDER BY d.n_chars DESC, l.doc_id) AS rn,
                  count(*) OVER (PARTITION BY l.cluster_rep)
                    AS cluster_size
           FROM labels l JOIN documents d ON l.doc_id = d.doc_id)
         SELECT cluster_rep, doc_id AS keep_doc,
                CAST(n_chars AS BIGINT) AS keep_chars,
                CAST(cluster_size AS BIGINT) AS cluster_size
         FROM ranked WHERE rn = 1 ORDER BY cluster_rep"""),

    // D53 — document authority by fixed-iteration PageRank (5 rounds,
    // d=0.85) over the near-dup graph — the web-graph ranking pass a
    // corpus curation pipeline samples against. The oracle unrolls the
    // five rounds as chained CTEs (recursive CTEs cannot aggregate in
    // the recursive term); scores round at 1e-6, far above the
    // summation-order noise floor of the tiny per-node neighbor sums.
    "pagerank_docs" -> QueryDef(
      (s, d) =>
        pageRank(
          Dedup.sharedPairs(s, d)
            .select(col("doc_a").as("src"), col("doc_b").as("dst")),
          iters = 5, damping = 0.85)
          .select(col("id").as("doc_id"),
            round(col("score"), 6).as("pagerank"))
          .orderBy("doc_id"),
      """WITH """ + Dedup.MurmurSql.pairGraphChainSql + """,
         sym AS MATERIALIZED (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs),
         deg AS MATERIALIZED (SELECT a, count(*) AS deg FROM sym GROUP BY a),
         nn AS (SELECT count(*) AS c FROM deg),
         p0 AS (SELECT a AS id, 1.0 / (SELECT c FROM nn) AS score FROM deg),
         p1 AS (SELECT s.b AS id,
                       0.15 / (SELECT c FROM nn) +
                       0.85 * sum(p.score / d.deg) AS score
                FROM sym s JOIN p0 p ON s.a = p.id JOIN deg d ON d.a = s.a
                GROUP BY s.b),
         p2 AS (SELECT s.b AS id,
                       0.15 / (SELECT c FROM nn) +
                       0.85 * sum(p.score / d.deg) AS score
                FROM sym s JOIN p1 p ON s.a = p.id JOIN deg d ON d.a = s.a
                GROUP BY s.b),
         p3 AS (SELECT s.b AS id,
                       0.15 / (SELECT c FROM nn) +
                       0.85 * sum(p.score / d.deg) AS score
                FROM sym s JOIN p2 p ON s.a = p.id JOIN deg d ON d.a = s.a
                GROUP BY s.b),
         p4 AS (SELECT s.b AS id,
                       0.15 / (SELECT c FROM nn) +
                       0.85 * sum(p.score / d.deg) AS score
                FROM sym s JOIN p3 p ON s.a = p.id JOIN deg d ON d.a = s.a
                GROUP BY s.b),
         p5 AS (SELECT s.b AS id,
                       0.15 / (SELECT c FROM nn) +
                       0.85 * sum(p.score / d.deg) AS score
                FROM sym s JOIN p4 p ON s.a = p.id JOIN deg d ON d.a = s.a
                GROUP BY s.b)
         SELECT id AS doc_id, round(score, 6) AS pagerank
         FROM p5 ORDER BY doc_id"""),

    // D57 — near-dup graph degree distribution: the structural health
    // check run BEFORE clustering — a heavy-tailed degree histogram
    // means a boilerplate template stitched unrelated documents into
    // one giant component and the pair threshold needs raising. Two
    // count aggregates over the symmetric edge list; the histogram is
    // degree-cardinality-bounded (tiny) regardless of corpus size.
    "dupgraph_degrees" -> QueryDef(
      (s, d) => {
        // both endpoints in ONE pass over the pair stream (a union of
        // two selects would evaluate the pair subtree twice)
        val sym = Dedup.sharedPairs(s, d)
          .select(explode(array(col("doc_a"), col("doc_b"))).as("id"))
        sym.groupBy("id").agg(count(lit(1)).as("degree"))
          .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
          .orderBy("degree")
      },
      """WITH """ + Dedup.MurmurSql.pairGraphChainSql + """,
         sym AS MATERIALIZED (
           SELECT doc_a AS id FROM pairs
           UNION ALL SELECT doc_b FROM pairs),
         deg AS MATERIALIZED (SELECT id, count(*) AS degree FROM sym GROUP BY id)
         SELECT degree, count(*) AS n_nodes
         FROM deg GROUP BY degree ORDER BY degree"""),

    // D60 — triangle census of the near-dup graph: triangles + open
    // wedges + global clustering coefficient — the second structural
    // health metric after the degree histogram (high clustering =
    // genuine duplicate families; low clustering at high degree =
    // boilerplate hub stitching unrelated docs). Edge-iterator
    // counting on the id-ORIENTED edge list (doc_a < doc_b holds for
    // every pair, so each triangle is counted exactly once as
    // a<b<c): two shuffle joins on endpoint keys, join width bounded
    // by per-vertex degree — the standard distributed formulation.
    // Wedges are Σ C(deg,2) from one count aggregate.
    "dup_triangles" -> QueryDef(
      (s, d) => {
        val e = Dedup.sharedPairs(s, d).select("doc_a", "doc_b")
        val tri = e.as("e1")
          .join(e.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
          .join(e.as("e3"),
            col("e3.doc_a") === col("e1.doc_a") &&
              col("e3.doc_b") === col("e2.doc_b"))
          .agg(count(lit(1)).as("n_triangles"))
        val wed = e.select(explode(array(col("doc_a"), col("doc_b"))).as("id"))
          .groupBy("id").agg(count(lit(1)).as("deg"))
          .agg(sum(col("deg") * (col("deg") - 1) / 2).cast("long")
            .as("n_wedges"))
        // n_wedges = 0 (non-empty graph that is a perfect matching)
        // must be guarded on BOTH sides: Spark's Divide yields NULL
        // but DuckDB's default ieee float ops yield inf/NaN — an
        // engine divergence the gate would trip on such a corpus
        tri.crossJoin(wed)
          .select(col("n_triangles"), col("n_wedges"),
            when(col("n_wedges") > 0,
              round(lit(3.0) * col("n_triangles") / col("n_wedges"), 4))
              .as("clustering"))
      },
      """WITH """ + Dedup.MurmurSql.pairGraphChainSql + """,
         tri AS (
           SELECT count(*) AS n_triangles
           FROM pairs e1
           JOIN pairs e2 ON e1.doc_b = e2.doc_a
           JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
         deg AS MATERIALIZED (
           SELECT id, count(*) AS deg
           FROM (SELECT doc_a AS id FROM pairs
                 UNION ALL SELECT doc_b FROM pairs)
           GROUP BY id),
         wed AS (SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
                 FROM deg)
         SELECT n_triangles, n_wedges,
                CASE WHEN n_wedges > 0
                     THEN round(3.0 * n_triangles / n_wedges, 4) END
                  AS clustering
         FROM tri, wed"""),

    // D64 — INCREMENTAL cluster maintenance: a batch of new documents
    // (a 10% modulo slice plays the arriving batch) lands against an
    // already-clustered 90% base corpus. Rather than re-pairing
    // everything (quadratic in ingest rounds at 100 TB), the update
    // graph is: the base's (id → label) assignments AS EDGES (they
    // encode base connectivity transitively), plus the batch-vs-base
    // pairs from the inverted-index PROBE (the base is never re-paired
    // with itself), plus the batch's internal pairs. CC over that
    // graph has the same components as a full recompute PROVIDED
    // base, batch, and full corpus agree on the candidate pair set —
    // which they do at EVERY scale: the hot-shingle set (df cap
    // max(1000, 0.1%·docs)) is computed ONCE over the full corpus and
    // passed to the probe and the batch pairing via `hotSet`, so
    // per-slice df thresholds can never disagree with the full-corpus
    // threshold the from-scratch answer uses (ClustersSpec proves the
    // hash match on a corpus where the cap actually drops a shingle).
    // The BASE labels are derived from the memoized corpus pair graph
    // (sliced to base∧base) — legitimate because pair qualification
    // is pairwise-local (identical hot set ⇒ identical base pairs,
    // see sharedPairs), and it is exactly the standing state a
    // production pipeline holds: the base was labeled when it was
    // ingested, so the BENCH line measures the incremental delta work
    // (probe + batch pairs + contracted CC), not a second full
    // pairing. Round-8 sf10 probe: the previous fixed `doc_id < 400`
    // split made the "batch" 99.9% of a 500k-doc corpus, and the
    // entry's THREE from-scratch pairings (base, cross, batch) wrote
    // a 67 GB shuffle on top of the persisted shared assets — a
    // measured disk-full, by bench-harness artifact, not by the
    // algorithm (whose delta work is bounded by construction).
    // ORACLE CONTRACT, branch-split like every chain consumer
    // (round 11 — the slice gate caught this): BELOW the pair budget
    // the oracle is the same recursive-CTE closure over ALL documents
    // as dedup_clusters, with NO split literal — the gate proves the
    // incremental path EQUALS the from-scratch answer for this (and
    // any) split, which holds because exact pair membership is
    // pairwise-local under the shared full-corpus hot set. ABOVE the
    // budget that equality is FALSE BY DESIGN: the from-scratch graph
    // is the lossy banded-LSH graph (recall ~0.97 at the decade),
    // while the incremental path keeps the EXACT inverted-index probe
    // for arrivals (per-batch probe cost is bounded by batch-incident
    // postings, so losslessness stays affordable exactly where the
    // full quadratic is not — strictly better recall than re-banding
    // the world, and the base labels are standing state either way).
    // Measured on the 250k-doc LSH-regime slice: incremental emits
    // 6 323 edge-incident docs vs the LSH recompute's 6 292 — the 31
    // extra are true near-dup pairs the banded graph missed. So above
    // budget the oracle replicates the incremental CONSTRUCTION
    // itself (base-sliced LSH labels + exact cross/batch probe +
    // closure), guarded on the same pspent scalar — self-consistency
    // gate there, equality gate below.
    // Restricted to edge-incident vertices to match.
    "cc_incremental" -> QueryDef(
      (s, d) => ccIncrementalGraph(s, d)._1.orderBy("doc_id"),
      ccIncrementalOracle),

    // D64b — IMPLEMENTATION-INDEPENDENT invariants of the incremental
    // closure (round-11 verdict item 3): above the pair budget
    // cc_incremental's oracle is a construction replica — both engines
    // compute the same incremental construction, which proves
    // cross-engine agreement but checks no property the construction
    // couldn't violate on both sides at once. This key gates three
    // properties ANY correct incremental clustering must satisfy,
    // computed by Spark over its own emitted output and hash-compared
    // to literal truth (the knn_graph recall_ok pattern):
    //  (a) base-label refinement — restricted to base docs, the
    //      incremental labels never SPLIT a standing base cluster
    //      (every base cluster's members present in the output map to
    //      exactly one output label);
    //  (b) edge containment — every emitted update edge (the exact
    //      probe pairs, the batch pairs, and the base label edges) is
    //      intra-cluster in the output;
    //  (c) closure idempotence — re-running connected components over
    //      the emitted labeling's own (doc → rep) star graph is a
    //      fixpoint: reps are self-labeled minima, no chained or
    //      non-canonical representatives survive.
    // Each is one keyed join/aggregate over the dup-bounded output —
    // cheap at any scale. The output identity itself stays gated by
    // cc_incremental at every proven SF; this key makes the
    // above-budget arm falsifiable by properties neither engine's
    // construction can define away.
    "cc_inc_invariants" -> QueryDef(
      (s, d) => {
        val (labels, updateEdges, baseLabels) = ccIncrementalGraph(s, d)
        // consumed by four checks — materialize once
        val out = labels.cutLineage()
        val la = out.select(col("doc_id"), col("cluster_rep").as("new_rep"))
        val splitBase = baseLabels
          .select(col("doc_id"), col("cluster_rep").as("base_rep"))
          .join(la, "doc_id")
          .groupBy("base_rep")
          .agg(count_distinct(col("new_rep")).as("nl"))
          .filter(col("nl") > 1L)
          .agg(count(lit(1)).as("n_split_base_clusters"))
        val interEdges = updateEdges
          .filter(col("src") =!= col("dst"))
          .join(la.select(col("doc_id").as("src"),
            col("new_rep").as("src_rep")), "src")
          .join(la.select(col("doc_id").as("dst"),
            col("new_rep").as("dst_rep")), "dst")
          .agg(coalesce(sum(when(col("src_rep") =!= col("dst_rep"), 1L)
            .otherwise(0L)), lit(0L)).as("n_inter_cluster_edges"))
        val relabel = connectedComponents(
          out.select(col("doc_id").as("src"), col("cluster_rep").as("dst")))
        val fixViol = out
          .join(relabel.withColumnRenamed("cluster_rep", "rep2"), "doc_id")
          .agg(coalesce(sum(when(col("cluster_rep") =!= col("rep2"), 1L)
            .otherwise(0L)), lit(0L)).as("n_fixpoint_violations"))
        splitBase.crossJoin(interEdges).crossJoin(fixViol)
          .select(col("n_split_base_clusters"),
            col("n_inter_cluster_edges"), col("n_fixpoint_violations"),
            (col("n_split_base_clusters") === 0L).as("refines_base"),
            (col("n_inter_cluster_edges") === 0L).as("edges_intra"),
            (col("n_fixpoint_violations") === 0L).as("closure_fixpoint"))
      },
      """SELECT CAST(0 AS BIGINT) AS n_split_base_clusters,
                CAST(0 AS BIGINT) AS n_inter_cluster_edges,
                CAST(0 AS BIGINT) AS n_fixpoint_violations,
                true AS refines_base,
                true AS edges_intra,
                true AS closure_fixpoint"""),


    // D67 — near-dup pair similarity histogram: pair counts per 0.05
    // Jaccard band — the threshold-tuning report read before committing
    // a dedup pass (a mass of pairs just above the cutoff means the
    // threshold sits on a cliff). Bin on the 4 dp-rounded score (an
    // exact integer-count ratio, so the floor cannot straddle engines);
    // output is band-bounded.
    "dedup_pair_hist" -> QueryDef(
      (s, d) =>
        Dedup.sharedPairs(s, d)
          .select((floor(col("jaccard") * 20) / 20).as("band_low"))
          .groupBy("band_low")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("band_low"),
      """WITH """ + Dedup.MurmurSql.pairGraphChainSql + """
         SELECT floor(jaccard * 20) / 20 AS band_low, count(*) AS n_pairs
         FROM pairs GROUP BY 1 ORDER BY band_low"""),

    // D68 — cluster source purity: per near-dup cluster, the share of
    // members from its majority source — near-1 purity means dup
    // families are intra-provider (dedup can shard by source); low
    // purity means cross-provider syndication (it cannot). Majority =
    // max count with min-source tiebreak, deterministic in both
    // engines; cluster-keyed aggregates are dup-family-bounded.
    "label_purity" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val members = sharedLabels(s, d)
          .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
        val bySrc = members.groupBy("cluster_rep", "source")
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("cluster_rep")
          .orderBy(col("n").desc, col("source"))
        bySrc
          .withColumn("rn", row_number().over(w))
          .withColumn("cluster_size",
            sum("n").over(Window.partitionBy("cluster_rep")))
          .filter(col("rn") === 1)
          .select(col("cluster_rep"),
            col("cluster_size"),
            col("source").as("majority_source"),
            round(col("n").cast("double") / col("cluster_size"), 4)
              .as("purity"))
          .orderBy("cluster_rep")
      },
      """WITH RECURSIVE
         """ + Dedup.MurmurSql.pairGraphChainSql + """,
         sym AS MATERIALIZED (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs
           UNION SELECT doc_a, doc_a FROM pairs
           UNION SELECT doc_b, doc_b FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         labels AS (
           SELECT a AS doc_id, min(b) AS cluster_rep
           FROM reach GROUP BY a),
         by_src AS (
           SELECT l.cluster_rep, d.source, count(*) AS n
           FROM labels l JOIN documents d USING (doc_id)
           GROUP BY 1, 2),
         ranked AS (
           SELECT cluster_rep, source, n,
                  row_number() OVER (PARTITION BY cluster_rep
                                     ORDER BY n DESC, source) AS rn,
                  sum(n) OVER (PARTITION BY cluster_rep) AS cluster_size
           FROM by_src)
         SELECT cluster_rep,
                CAST(cluster_size AS BIGINT) AS cluster_size,
                source AS majority_source,
                round(CAST(n AS DOUBLE) / cluster_size, 4) AS purity
         FROM ranked WHERE rn = 1 ORDER BY cluster_rep"""))
}
