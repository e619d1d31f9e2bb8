package graft.text

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Tokenizer-construction passes of a training-data pipeline: BPE
  * merge-candidate counting (the inner loop of byte-pair-encoding
  * vocabulary induction, Sennrich et al. 2016) and deterministic text
  * normalization (the cleanup step that runs before any tokenization).
  *
  * Scale shape: the corpus-proportional work is ONE word-keyed shuffle
  * (the word-frequency aggregate — the same shuffle any tokenizer
  * trainer pays). Everything after operates on the VOCABULARY table
  * (distinct words), which is sublinear in corpus size, so the
  * character-pair explode never touches corpus scale. This is exactly
  * why real BPE trainers count word frequencies first.
  */
object Vocab {
  import org.apache.spark.sql.{Column, DataFrame}

  /** Adjacent-character-pair frequencies over (text), weighted by word
    * frequency — one word-keyed shuffle, then vocabulary-bounded work.
    */
  def bpePairCounts(docs: DataFrame, k: Int): DataFrame = {
    val words = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val vocab = words.groupBy("w").agg(count(lit(1)).as("c"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("c"), explode(
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(sum("c").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Control-char strip + whitespace collapse + trim, as a Column. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "\\p{Cc}", " "), " +", " "))

  val defs: Map[String, QueryDef] = Map(

    // D51 — BPE merge-candidate counts: frequency of each adjacent
    // character pair, weighted by word frequency. The top pair is what
    // a BPE trainer would merge next; the top-50 table is the
    // vocabulary-induction work list. Guard length>=2 explicitly:
    // Spark's sequence(1, 0) produces a DESCENDING [1,0], not empty.
    "bpe_pair_counts" -> QueryDef(
      (s, d) => bpePairCounts(Tables.documents(s, d), 50),
      """WITH words AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
           FROM documents),
         wc AS (SELECT w, count(*) AS c FROM words WHERE w <> '' GROUP BY w),
         pairs AS (
           SELECT substring(w, CAST(i AS INT), 2) AS pair, c
           FROM wc, unnest(range(1, length(w))) AS t(i)
           WHERE length(w) >= 2)
         SELECT pair, CAST(sum(c) AS BIGINT) AS n
         FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 50"""),

    // D52 — deterministic text normalization: strip control characters,
    // collapse whitespace runs, trim. The oracle PLANTS noise first
    // (tabs, CRLF, doubled spaces — built identically in both engines)
    // so the pass is exercised on every row, then md5 hash-proves the
    // normalized output byte-identical. Pure narrow map — zero shuffles,
    // scan-local at any corpus size.
    "text_normalize" -> QueryDef(
      (s, d) => {
        val noisy = concat(lit("\t "),
          regexp_replace(col("text"), " ", "  "), lit(" \r\n"))
        val norm = normalized(noisy)
        Tables.documents(s, d)
          .select(col("doc_id"), md5(norm).as("norm_md5"),
            length(norm).as("n_chars_norm"))
          .orderBy("doc_id")
      },
      """WITH noisy AS (
           SELECT doc_id,
                  chr(9) || ' ' || replace(text, ' ', '  ') || ' ' ||
                  chr(13) || chr(10) AS x
           FROM documents)
         SELECT doc_id,
                md5(trim(regexp_replace(
                  regexp_replace(x, '\p{Cc}', ' ', 'g'), ' +', ' ', 'g')))
                  AS norm_md5,
                CAST(length(trim(regexp_replace(
                  regexp_replace(x, '\p{Cc}', ' ', 'g'), ' +', ' ', 'g')))
                  AS INT) AS n_chars_norm
         FROM noisy ORDER BY doc_id""")
  )
}
