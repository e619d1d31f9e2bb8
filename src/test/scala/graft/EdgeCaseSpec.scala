package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.{Clusters, Dedup}
import graft.text.{Contamination, CorpusIndex}

/** Degenerate-input behavior: a 100 TB pipeline's first production run
  * is often over a shard with zero rows (new source, empty partition) —
  * every curation stage must return an empty result, not throw.
  */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "text", "source", "n_chars")
  }

  test("every dedup stage returns empty on an empty corpus") {
    val docs = emptyDocs
    assert(Dedup.ngramJaccardPairs(docs, 0.5).count() == 0)
    val edges = Dedup.ngramJaccardPairs(docs, 0.5)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    assert(Clusters.connectedComponents(edges).count() == 0)
    assert(CorpusIndex.chunkDedupStats(docs, 16).count() == 0)
  }

  test("contamination and curation return empty on an empty corpus") {
    assert(Contamination.contaminationScores(emptyDocs, "src0").count() == 0)
    assert(graft.text.Curate.keptSet(emptyDocs).count() == 0)
  }

  test("single-doc corpus: no pairs, no clusters, everything kept") {
    import spark.implicits._
    val one = Seq((1L, ("tok " * 30).trim, "srcA", 120L))
      .toDF("doc_id", "text", "source", "n_chars")
    assert(Dedup.ngramJaccardPairs(one, 0.5).count() == 0)
    val stats = CorpusIndex.chunkDedupStats(one, 16)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(stats.toSeq == Seq((1L, 1L)))
  }

  test("round-6 diagnostics return empty (not throw) on an empty corpus") {
    val docs = emptyDocs
    assert(CorpusIndex.spanCoverage(docs, 16).count() == 0)
    assert(graft.text.CorpusStats.lengthQuantiles(docs).count() == 0)
    assert(Dedup.bandProfile(docs).count() == 0)
    import spark.implicits._
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(graft.similarity.VectorAnalytics.normProfile(emptyEmb).count() == 0)
  }

  test("zipf fit on a single-term corpus reports k=1 with NULL slope") {
    import spark.implicits._
    val docs = Seq((1L, "word word word")).toDF("doc_id", "text")
    val r = graft.text.LexStats.zipfFit(docs).collect().head
    // one spectrum point cannot determine a slope: both engines must
    // agree on NULL (Spark would otherwise emit NaN from 0/0)
    assert(r.getLong(0) == 1L)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("normalizeTs maps nanos-as-long and NTZ encodings to one instant") {
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampType
    // 1700000000 epoch seconds = 2023-11-14T22:13:20Z; the generator
    // has shipped events.ts as TIMESTAMP(NANOS) (reads as long under
    // nanosAsLong) and as timestamp[us] NTZ across rounds — both must
    // normalize to the same instant-typed column
    val asLong = Seq((1L, 1700000000000000000L)).toDF("id", "ts")
    val asNtz = spark.sql(
      "SELECT 1L AS id, make_timestamp_ntz(2023, 11, 14, 22, 13, 20) AS ts")
    val a = Tables.normalizeTs(asLong)
    val b = Tables.normalizeTs(asNtz)
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    val va = a.select(unix_micros(col("ts"))).head.getLong(0)
    val vb = b.select(unix_micros(col("ts"))).head.getLong(0)
    assert(va == 1700000000000000L && vb == va)
  }
}
