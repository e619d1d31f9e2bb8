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

  test("boilerplate strip drops EVERY copy of a repeated chunk, keeps unique ones") {
    import spark.implicits._
    val tmpl = (1 to 16).map(i => s"t$i").mkString(" ") // shared template
    val a16 = (1 to 16).map(i => s"a$i").mkString(" ")
    val b16 = (1 to 16).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$tmpl $a16 xtail"), // template + unique + tail
      (2L, s"$tmpl $b16"),       // template + unique
      (3L, b16.replace("b", "c")) // fully unique
    ).toDF("doc_id", "text")
    val got = CorpusIndex.boilerplateStrip(docs, 16)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // the template chunk appears twice corpus-wide, so BOTH copies go
    // (unlike chunkDedupStats, which keeps doc 1's); unique chunks stay
    assert(got.map(g => (g._1, g._2, g._3)).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 1L, 1L)))
    // doc 1 rebuilds as its unique chunk + the tail token
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0)._4 == md5hex(s"$a16 xtail"))
    assert(got(1)._4 == md5hex(b16))
  }

  test("intradoc strip drops in-doc repeats but keeps cross-doc repeats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c d x"), // "a b" repeats IN-doc: second copy goes
      (2L, "a b e f")        // "a b" again, but cross-doc: stays
    ).toDF("doc_id", "text")
    val got = CorpusIndex.intradocStrip(docs, 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq ==
      Seq((1L, 3L, 2L), (2L, 2L, 2L)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1 rebuilds without the repeated "a b", tail token intact
    assert(got(0)._4 == md5hex("a b c d x"))
    assert(got(1)._4 == md5hex("a b e f"))
  }

  test("lang confusion cells and shares for planted mislabeled docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the a of x", "en"),   // en predicted, en declared
      (2L, "el la de y", "en"),   // es predicted, en declared (mislabel)
      (3L, "der die und z", "de") // de/de
    ).toDF("doc_id", "text", "lang")
    val got = graft.text.TextAnalysis.withLangId(docs)
      .groupBy("lang", "predicted_lang").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("en", "en") -> 1L, ("en", "es") -> 1L,
      ("de", "de") -> 1L))
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

  test("source matrix buckets a cross-feed pair off-diagonal, intra-feed on") {
    import spark.implicits._
    val docs = Seq(
      (1L, "feedA"), (2L, "feedB"), (3L, "feedA"), (4L, "feedA")
    ).toDF("doc_id", "source")
    val pairs = Seq(
      (1L, 2L, 0.8), // A×B — the reselling signal
      (3L, 4L, 0.6)  // A×A — self-duplication
    ).toDF("doc_a", "doc_b", "jaccard")
    val got = graft.text.Curate.sourceMatrix(docs, pairs)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("feedA", "feedA", 1L, 0.6),
      ("feedA", "feedB", 1L, 0.8)))
  }

  test("pair matrix generalizes to any attribute: lang off-diagonal") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en"), (2L, "de"), (3L, "en"), (4L, "en")
    ).toDF("doc_id", "lang")
    val pairs = Seq((1L, 2L, 0.9), (3L, 4L, 0.7))
      .toDF("doc_a", "doc_b", "jaccard")
    val got = graft.text.Curate.pairMatrix(docs, pairs, "lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // cross-lang lexical near-dup = boilerplate or mislabel signal
    assert(got == Seq(("de", "en", 1L, 0.9), ("en", "en", 1L, 0.7)))
  }

  test("quality-by-lang pass rates are consistent and cover every lang") {
    val rows = SparkEntry.queries("quality_by_lang")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))
    val nLangs = Tables.documents(spark, TestSpark.sf)
      .select("lang").distinct().count()
    assert(rows.length == nLangs)
    rows.foreach { case (lang, n, mq, nPass, rate) =>
      assert(mq >= 0.0 && mq <= 1.0, lang)
      assert(nPass <= n)
      assert(rate == math.rint(nPass.toDouble / n * 10000) / 10000)
    }
  }

  test("curation funnel attributes losses to the right stage per source") {
    import spark.implicits._
    val stop100 = Seq.fill(100)("the").mkString(" ") // quality 1.0
    val uniq100 = (1 to 100).map(i => s"w$i").mkString(" ") // quality 0.6
    val docs = Seq(
      (1L, stop100, "srcA"),  // passes everything
      (2L, "xx yy", "srcA"),  // fails quality AND length
      (3L, uniq100, "srcB"),  // cluster representative
      (4L, uniq100, "srcB")   // duplicate of 3 (planted label)
    ).toDF("doc_id", "text", "source")
    val labels = Seq((3L, 3L), (4L, 3L)).toDF("doc_id", "cluster_rep")
    val got = graft.text.Curate.curationFunnel(docs, labels)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      ("srcA", 2L, 1L, 1L, 2L, 1L, 0.5),
      ("srcB", 2L, 2L, 2L, 1L, 1L, 0.5)))
  }

  test("cluster size histogram counts component sizes from the edge list") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val labels = graft.dedup.Clusters.connectedComponents(edges)
    val hist = labels.groupBy("cluster_rep")
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hist == Map(2L -> 1L, 3L -> 1L))
  }

  test("dedup savings agrees with the doc-level dup report per source") {
    val savings = SparkEntry.queries("dedup_savings")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val docTotals = Tables.documents(spark, TestSpark.sf)
      .groupBy("source").agg(sum("n_chars").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val dupDocs = SparkEntry.queries("dup_rate_by_source")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    savings.foreach { case (src, total, dropped, frac) =>
      assert(total == docTotals(src))
      assert(dropped >= 0 && dropped <= total)
      assert(frac >= 0.0 && frac <= 1.0)
      // a source with zero dup DOCS must save zero BYTES, and one with
      // dup docs must save a positive number of bytes
      if (dupDocs(src) == 0L) assert(dropped == 0L)
      else assert(dropped > 0L)
    }
  }

  test("shard balance covers 16 shards and accounts for every doc") {
    val rows = SparkEntry.queries("shard_balance")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._1).forall(s => s >= 0 && s <= 15))
    val docs = Tables.documents(spark, TestSpark.sf)
    assert(rows.map(_._2).sum == docs.count())
    assert(rows.map(_._3).sum ==
      docs.agg(sum("n_chars")).head.getLong(0))
  }

  test("corpus diff partitions each side's hashes into common and exclusive") {
    val rows = SparkEntry.queries("corpus_diff")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, a, b, common, added, removed) =>
      assert(common + added == b, src)
      assert(common + removed == a, src)
    }
    // side totals must equal the distinct content hashes actually present
    val docs = Tables.documents(spark, TestSpark.sf)
    val nA = docs.filter(col("doc_id") < 400)
      .select(md5(col("text").cast("binary")), col("source"))
      .distinct().count()
    assert(rows.map(_._2).sum == nA)
  }

  test("span coverage counts corpus-repeated chunks per source") {
    import spark.implicits._
    val shared = (1 to 4).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared e f g h", "src1"), // 2 chunks, first repeated in doc 2
      (2L, s"$shared x y z w", "src1"), // 2 chunks, first repeated in doc 1
      (3L, "p q", "src2")               // too short for any chunk
    ).toDF("doc_id", "text", "source")
    val got = CorpusIndex.spanCoverage(docs, 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got == Seq(
      ("src1", 2L, 4L, 2L, Some(0.5)),
      ("src2", 1L, 0L, 0L, None)))
  }
}
