package graft.ingest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryDef, Tables}

/** Training-data export (SURVEY §2 A22): JSONL is THE interchange format
  * LLM training stacks consume, so the engine must write it losslessly.
  * The gate entry round-trips the documents table through an actual
  * JSONL file sink (`to_json` → text sink → schema'd JSON read-back)
  * and hash-proves byte-identical text against the parquet oracle —
  * JSON string escaping, unicode, and numeric fidelity all on the line.
  * Both legs are distributed (per-partition files, no driver collect);
  * at scale the same plan writes a partitioned directory tree.
  */
object Export {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  val defs: Map[String, QueryDef] = Map(
    "export_jsonl" -> QueryDef(
      (s, d) => {
        val tmp = graft.Tables.freshScratchDir("jsonl") + "/docs"
        Tables.documents(s, d)
          .select(to_json(struct(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("text"))).as("value"))
          .write.mode("overwrite").text(tmp)
        s.read.schema(docSchema).json(tmp)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            md5(col("text").cast("binary")).as("text_md5"))
          .orderBy("doc_id")
      },
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
         FROM documents ORDER BY doc_id"""))
}
