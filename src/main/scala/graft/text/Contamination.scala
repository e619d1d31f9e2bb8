package graft.text

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.dedup.Dedup

/** Benchmark decontamination + stratified sampling — two curation ops a
  * training-data pipeline runs after dedup (SURVEY §2 D-series).
  *
  * Reference anchor: the reference pipeline curates ingested event
  * payloads before analytics (lambda_*_transformation); these extend the
  * same curation surface to the LLM-corpus tables.
  */
object Contamination {

  /** The held-out "benchmark" partition: a deterministic source split.
    * In production this is the eval-suite text (MMLU, GSM8K, …) loaded
    * as its own table; the gate models it as one source shard so the
    * oracle can reproduce the split.
    */
  private val BenchSource = "src0"

  /** Contamination core: per non-benchmark doc, the fraction of its
    * distinct word n-grams that occur anywhere in the benchmark
    * partition. Factored out so specs can plant a doc copied from the
    * benchmark and assert contamination = 1.0.
    */
  def contaminationScores(docs: org.apache.spark.sql.DataFrame,
      benchSource: String): org.apache.spark.sql.DataFrame = {
    val sh = Dedup.withShingles(docs)
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("source"), col("shingles"))
    val bench = sh.filter(col("source") === benchSource)
      .select(explode(col("shingles")).as("s")).distinct()
    val train = sh.filter(col("source") =!= benchSource)
    val hits = train
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .join(bench, "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    train.select(col("doc_id"), size(col("shingles")).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contamination",
        round(col("n_hits") / col("n_shingles"), 4))
  }

  val defs: Map[String, QueryDef] = Map(

    // Benchmark contamination scoring: fraction of each training doc's
    // distinct word n-grams that also occur anywhere in the benchmark
    // set. The standard pre-training hygiene op (eval leakage check).
    //
    // Scale shape: the benchmark side is BOUNDED by the eval suite
    // (millions of n-grams, not corpus-proportional), so after the
    // distinct() its inverted list is small; the join on the shingle is
    // a single shuffle of the training side, and AQE turns the bench
    // side into a broadcast when it fits. No all-pairs path; cost is
    // O(corpus shingles) — the same discipline as Dedup's inverted
    // index (Dedup.scala:31).
    "decontaminate" -> QueryDef(
      (s, d) =>
        contaminationScores(Tables.documents(s, d), BenchSource)
          .orderBy("doc_id"),
      """WITH toks AS (
           SELECT doc_id, source,
                  regexp_split_to_array(trim(text), '\s+') AS t
           FROM documents),
         sh AS (
           SELECT doc_id, source,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t) - 1)]) AS shingles
           FROM toks WHERE len(t) >= 3),
         bench AS (
           SELECT DISTINCT unnest(shingles) AS s FROM sh
           WHERE source = 'src0'),
         train AS (SELECT doc_id, shingles FROM sh WHERE source <> 'src0'),
         ex AS (SELECT doc_id, unnest(shingles) AS s FROM train),
         hits AS (
           SELECT ex.doc_id, count(*) AS n_hits
           FROM ex JOIN bench ON ex.s = bench.s
           GROUP BY 1)
         SELECT t.doc_id,
                CAST(len(t.shingles) AS INT) AS n_shingles,
                CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                round(CAST(coalesce(h.n_hits, 0) AS DOUBLE)
                      / len(t.shingles), 4) AS contamination
         FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
         ORDER BY t.doc_id"""),

    // Per-source stratified sampling with a content-stable hash: each
    // source shard gets its own keep-rate (web crawl downsampled, books
    // upweighted, …) and membership is a pure function of doc_id — the
    // same reproducibility property as dataset_split
    // (TextAnalysis.scala:181); rand()-based sampleBy is neither
    // reproducible across runs nor engine-portable. One scan, one
    // narrow filter, one aggregation shuffle; nothing is
    // corpus-proportional on the driver.
    "stratified_sample" -> QueryDef(
      (s, d) => {
        val rate = (lit(10) +
          (substring(col("source"), 4, 10).cast("int") % 5) * lit(20))
          .as("rate_pct")
        // hex chars 3-4 of the md5 → an independent bucket from
        // dataset_split's chars 1-2 (a doc's split and its sample
        // membership must not correlate)
        val bucket = conv(
          substring(md5(col("doc_id").cast("string").cast("binary")), 3, 2),
          16, 10).cast("int")
        Tables.documents(s, d)
          .withColumn("rate_pct", rate)
          .withColumn("_b", bucket)
          .filter(col("_b") * 100 < col("rate_pct") * 256)
          .groupBy("source", "rate_pct")
          .agg(count(lit(1)).as("n_kept"),
            sum("n_chars").as("kept_chars"))
          .orderBy("source")
      },
      """SELECT source, rate_pct, count(*) AS n_kept,
                CAST(sum(n_chars) AS BIGINT) AS kept_chars
         FROM (
           SELECT source, n_chars,
                  10 + (CAST(substring(source, 4) AS INT) % 5) * 20
                    AS rate_pct,
                  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 3, 2))
                       AS INT) AS b
           FROM documents)
         WHERE b * 100 < rate_pct * 256
         GROUP BY source, rate_pct ORDER BY source"""),

    // D98 — corpus snapshot diff by CONTENT: docs 0–399 play snapshot
    // A, 400+ snapshot B (the same split convention as D41's
    // incremental dedup), and the diff is computed over distinct
    // content hashes per source — added / removed / carried-over text,
    // regardless of doc_id churn. This is how corpus re-crawls are
    // audited: a feed whose n_removed spikes between snapshots lost
    // content (license change, link rot), and id-based diffing cannot
    // see it because re-crawls reassign ids. One (source, hash)
    // shuffle with map-side partial agg — the hash side-presence
    // collapse — then a source-bounded roll-up; exact integers.
    "corpus_diff" -> QueryDef(
      (s, d) => {
        val h = Tables.documents(s, d).select(col("source"),
          md5(col("text").cast("binary")).as("h"),
          (col("doc_id") < 400).as("in_a"))
        h.groupBy("source", "h")
          .agg(max(when(col("in_a"), lit(1)).otherwise(lit(0))).as("a"),
            max(when(!col("in_a"), lit(1)).otherwise(lit(0))).as("b"))
          .groupBy("source")
          .agg(sum("a").cast("bigint").as("n_hashes_a"),
            sum("b").cast("bigint").as("n_hashes_b"),
            sum(when(col("a") === 1 && col("b") === 1, lit(1L))
              .otherwise(lit(0L))).as("n_common"),
            sum(when(col("a") === 0 && col("b") === 1, lit(1L))
              .otherwise(lit(0L))).as("n_added"),
            sum(when(col("a") === 1 && col("b") === 0, lit(1L))
              .otherwise(lit(0L))).as("n_removed"))
          .orderBy("source")
      },
      """WITH sides AS (
           SELECT source, md5(text) AS h,
                  max(CASE WHEN doc_id < 400 THEN 1 ELSE 0 END) AS a,
                  max(CASE WHEN doc_id >= 400 THEN 1 ELSE 0 END) AS b
           FROM documents GROUP BY source, md5(text))
         SELECT source,
                CAST(sum(a) AS BIGINT) AS n_hashes_a,
                CAST(sum(b) AS BIGINT) AS n_hashes_b,
                CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_common,
                CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_added,
                CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_removed
         FROM sides GROUP BY source ORDER BY source"""))
}
