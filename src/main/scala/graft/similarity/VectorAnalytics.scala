package graft.similarity

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Distributed vector analytics: dimension-wise aggregation (the
  * building block of centroid computation / mean-pooling at corpus
  * scale) and corpus n-gram statistics. Both decompose into plain
  * shuffles — posexplode spreads each vector over (row, dim) pairs, so a
  * 100 TB corpus centroids with one partial-agg shuffle on (label, dim),
  * never collecting vectors anywhere.
  */
object VectorAnalytics {

  val defs: Map[String, QueryDef] = Map(

    // Per-label centroid norms: posexplode → dimension-wise mean →
    // reassemble → L2 norm. Oracle does the same via unnest WITH
    // ORDINALITY, with the norm in fixed dimension order.
    "label_centroids" -> QueryDef(
      (s, d) =>
        Tables.embeddings(s, d)
          .select(col("label"), posexplode(col("embedding")))
          .groupBy("label", "pos")
          .agg(avg(col("col").cast("double")).as("dim_mean"))
          .groupBy("label")
          .agg(
            round(sqrt(sum(col("dim_mean") * col("dim_mean"))), 4)
              .as("centroid_norm"),
            count(lit(1)).as("n_dims"))
          .orderBy("label"),
      """WITH dims AS (
           SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, unnest(range(1, 65)) AS t(i)),
         centroid AS (
           SELECT label, pos, avg(x) AS dim_mean
           FROM dims GROUP BY label, pos)
         SELECT label,
                round(sqrt(sum(dim_mean * dim_mean)), 4) AS centroid_norm,
                count(*) AS n_dims
         FROM centroid GROUP BY label ORDER BY label"""),

    // Corpus bigram frequency: the n-gram statistics pass of a language
    // model data pipeline (explode 2-gram shingles, global count, top 20).
    "top_bigrams" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(explode(graft.functions.HashOps.wordShingles(col("text"), 2))
            .as("bigram"))
          .groupBy("bigram")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("n_docs").desc, col("bigram"))
          .limit(20),
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           FROM documents),
         bg AS (
           SELECT doc_id,
                  unnest(list_distinct([array_to_string(t[i:i+1], ' ')
                                        for i in range(1, len(t))])) AS bigram
           FROM toks WHERE len(t) >= 2)
         SELECT bigram, count(*) AS n_docs
         FROM bg GROUP BY bigram
         ORDER BY n_docs DESC, bigram LIMIT 20"""))
}
