package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.HashOps

/** Diagnostic main: quantifies the MinHash band-bucket candidate mass
  * of a corpus — Σ over (band, band_key) buckets of n·(n−1)/2 — the
  * exact work the LSH band join performs before Jaccard verification.
  * Used to decide where superlinear growth in the minhash family comes
  * from at a new scale decade (real near-dup structure vs bucket skew).
  *
  * Usage: tools/run_main.sh graft.tools.BandProbe <sfDir>
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, args(0))
    val sh = graft.dedup.Dedup.withShingles(docs)
      .select(col("doc_id"), col("shingles"))
    val sig = sh.withColumn("sig", HashOps.minhash(col("shingles"), 128))
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(31)),
        b => hash(slice(col("sig"), b * lit(4) + 1, lit(4))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val buckets = banded.groupBy("band", "band_key")
      .agg(count(lit(1)).as("n"))
    buckets.agg(
      count(lit(1)).as("n_buckets"),
      sum(col("n") * (col("n") - 1) / 2).as("cand_pairs"),
      max(col("n")).as("max_bucket"),
      sum(when(col("n") > 100, col("n") * (col("n") - 1) / 2)
        .otherwise(0)).as("cand_from_buckets_gt100"))
      .show(false)
    buckets.filter(col("n") > 100).orderBy(desc("n")).show(20, false)
    // members of the largest bucket: who are these docs?
    val top = buckets.orderBy(desc("n")).limit(1)
    banded.join(top, Seq("band", "band_key"))
      .join(docs.select(col("doc_id"), substring(col("text"), 1, 80).as("snip")),
        "doc_id")
      .orderBy("doc_id").show(12, false)
    // same profile for the containment-LSH scheme (wrap32, 64 bands x 2)
    val sigW = sh.filter(size(col("shingles")) > 0)
      .select(col("doc_id"), HashOps.minhashW32(col("shingles"), 128).as("sig"))
    val bandedW = sigW.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(63)),
        b => hash(slice(col("sig"), b * lit(2) + 1, lit(2))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    bandedW.groupBy("band", "band_key").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("w32_n_buckets"),
        sum(col("n") * (col("n") - 1) / 2).as("w32_cand_pairs"),
        max(col("n")).as("w32_max_bucket"),
        sum(when(col("n") > 256, col("n") * (col("n") - 1) / 2)
          .otherwise(0)).as("w32_cand_from_gt256"))
      .show(false)
    spark.stop()
  }
}
