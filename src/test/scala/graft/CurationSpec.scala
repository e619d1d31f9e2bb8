package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Contamination, CorpusIndex}

/** Semantics checks for the curation ops whose gate oracles run on a
  * corpus without planted pathologies: copied chunks and benchmark
  * leakage are constructed here explicitly.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("exact chunk dedup keeps first occurrence and drops later copies") {
    import spark.implicits._
    val w16 = (1 to 16).map(i => s"w$i").mkString(" ")
    val u16 = (1 to 16).map(i => s"u$i").mkString(" ")
    val v16 = (1 to 16).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      (1L, s"$w16 $u16"), // both chunks first occurrences
      (2L, s"$w16 $v16"), // first chunk copied from doc 1, second fresh
      (3L, s"$v16 $w16")  // both chunks already seen
    ).toDF("doc_id", "text")
    val got = CorpusIndex.chunkDedupStats(docs, 16)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L)))
  }

  test("a doc copied from the benchmark scores contamination 1.0, disjoint scores 0") {
    import spark.implicits._
    val benchText = (1 to 12).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (10L, benchText, "bench"),                          // the eval doc
      (11L, benchText, "train"),                          // verbatim leak
      (12L, (1 to 12).map(i => s"c$i").mkString(" "), "train") // clean
    ).toDF("doc_id", "text", "source")
    val got = Contamination.contaminationScores(docs, "bench")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == Seq((11L, 1.0), (12L, 0.0)))
  }

  test("benchmark docs are excluded from the scored output") {
    val out = SparkEntry.queries("decontaminate")(spark, TestSpark.sf)
    val n = out.count()
    assert(n > 0)
    // joined back to documents: no src0 rows may appear
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"))
    assert(out.join(docs, "doc_id")
      .filter(col("source") === "src0").count() == 0)
  }
}
