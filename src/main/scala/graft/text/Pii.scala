package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** PII redaction and n-gram language-model scoring — two curation
  * passes every LLM training pipeline runs before a corpus ships
  * (SURVEY §2 D-series extensions).
  *
  * Both are single-pass, scan-local or single-shuffle constructions:
  * redaction is a fixed battery of codegen'd `regexp_replace` calls
  * (no UDF, no state), LM scoring is one token shuffle shared by the
  * vocabulary aggregation and the scoring join.
  */
object Pii {

  /** Redaction battery, applied in a fixed order (emails first so their
    * digits can't later be half-matched as phone numbers). The patterns
    * stay inside the syntax subset Java regex and RE2 (DuckDB) share,
    * so the oracle runs the byte-identical battery.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, emailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipRe, "<IP>")
    regexp_replace(noIp, phoneRe, "<PHONE>")
  }

  /** The documents corpus contains no digits at all, so to PROVE the
    * battery redacts (not just that it leaves clean text alone) the
    * gate entry plants deterministic PII derived from doc_id — same
    * construction on both engines — and hash-compares the redacted
    * output. A zero-PII corpus would make the oracle vacuous.
    */
  private def planted(): Column =
    concat(col("text"),
      lit(" Contact user"), col("doc_id"), lit("@example.com or 555-"),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (col("doc_id") % 256).cast("string"),
      lit(".0."), ((col("doc_id") * 7) % 256).cast("string"))

  val defs: Map[String, QueryDef] = Map(

    // D25 — PII redaction: counts per category + md5 of the redacted
    // text (the hash proves byte-identical redaction cross-engine).
    "pii_redact" -> QueryDef(
      (s, d) => {
        val enriched = planted()
        Tables.documents(s, d)
          .select(col("doc_id"), enriched.as("enriched"))
          .select(
            col("doc_id"),
            regexp_count(col("enriched"), lit(emailRe)).as("n_emails"),
            regexp_count(col("enriched"), lit(ipRe)).as("n_ips"),
            regexp_count(
              regexp_replace(regexp_replace(col("enriched"), emailRe, "<EMAIL>"),
                ipRe, "<IP>"),
              lit(phoneRe)).as("n_phones"),
            md5(redact(col("enriched")).cast("binary")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      s"""WITH e AS (
           SELECT doc_id,
                  text || ' Contact user' || doc_id || '@example.com or 555-'
                       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                    AS enriched
           FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(enriched, '$emailRe')) AS INT)
                  AS n_emails,
                CAST(len(regexp_extract_all(enriched, '$ipRe')) AS INT)
                  AS n_ips,
                CAST(len(regexp_extract_all(
                  regexp_replace(regexp_replace(enriched, '$emailRe', '<EMAIL>', 'g'),
                                 '$ipRe', '<IP>', 'g'),
                  '$phoneRe')) AS INT) AS n_phones,
                md5(regexp_replace(regexp_replace(regexp_replace(enriched,
                      '$emailRe', '<EMAIL>', 'g'),
                      '$ipRe', '<IP>', 'g'),
                      '$phoneRe', '<PHONE>', 'g')) AS redacted_md5
         FROM e ORDER BY doc_id"""),

    // D26 — unigram LM scoring: corpus-wide token probabilities, each
    // document scored by its mean token log-probability (the cheap
    // perplexity proxy used for quality filtering). The token frame
    // shuffles on `term` once; the vocabulary aggregation and the
    // scoring join both consume that partitioning (no broadcast of the
    // open vocabulary — same discipline as tfidf_top_terms), then one
    // shuffle back on doc_id for the per-doc mean.
    "lm_score" -> QueryDef(
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(split(trim(col("text")), "\\s+")).as("term"))
        val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
        val total = toks.agg(count(lit(1)).as("total"))
        toks.join(vocab, "term")
          .crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(avg(log(col("cnt").cast("double") / col("total").cast("double"))), 4)
              .as("avg_logprob"))
          .orderBy("doc_id")
      },
      """WITH toks AS (
           SELECT doc_id,
                  unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
         n AS (SELECT count(*) AS total FROM toks)
         SELECT doc_id, count(*) AS n_tokens,
                round(avg(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))), 4)
                  AS avg_logprob
         FROM toks JOIN vocab USING (term) CROSS JOIN n
         GROUP BY doc_id ORDER BY doc_id"""),

    // D28 — bigram LM scoring: conditional log-probability
    // ln(c(w1,w2)/c(w1·)) averaged per document — the next-order
    // perplexity proxy after D26. The bigram frame shuffles once on
    // (w1,w2) for the numerator counts and once on w1 for the prefix
    // counts; both joins are plain shuffle joins (open vocabulary, no
    // broadcast), then one shuffle back on doc_id for the mean.
    "lm_bigram_score" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("t", split(trim(col("text")), "\\s+"))
          .filter(size(col("t")) >= 2)
        val bg = docs.select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
            struct(element_at(col("t"), i).as("w1"),
              element_at(col("t"), i + lit(1)).as("w2")))).as("b"))
          .select(col("doc_id"), col("b.w1"), col("b.w2"))
        val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
        bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            round(avg(log(col("c2").cast("double") / col("c1").cast("double"))), 4)
              .as("avg_bigram_logprob"))
          .orderBy("doc_id")
      },
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           FROM documents),
         bg AS (
           SELECT doc_id, t[i] AS w1, t[i+1] AS w2
           FROM toks, unnest(range(1, len(t))) u(i)
           WHERE len(t) >= 2),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1)
         SELECT doc_id, count(*) AS n_bigrams,
                round(avg(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))), 4)
                  AS avg_bigram_logprob
         FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
         GROUP BY doc_id ORDER BY doc_id"""))
}
