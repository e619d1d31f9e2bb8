package graft

import org.apache.spark.sql.SparkSession

/** Band-cap asymptote sweep (round-9 verdict item 2): the dense-decade
  * LSH pair family's CPU follows its candidate mass, and the committed
  * claim was that the absolute 256 band-bucket cap bends the mass from
  * the measured ~21×/decade toward the O(n_buckets · cap²) envelope as
  * buckets cross the cap — plausible from the code, but no artifact
  * showed the bend. This main MEASURES it: one signature pass per
  * corpus produces the band-bucket size histogram
  * ([[graft.dedup.Dedup.bandBucketSizeHist]], the identical packed keys
  * the candidate join groups on), and the per-cap candidate mass
  * Σ_{sz ≤ cap} C(sz,2) for cap ∈ {32, 64, 128, 256, 512, ∞} is then a
  * driver-side fold over that (tiny) histogram. Sweeping the cap at a
  * FIXED corpus is the future-decade proxy: bucket sizes grow ~linearly
  * with the corpus at fixed vocabulary, so the mass a cap-c run admits
  * at sf10 previews what cap-256 admits at ~sf(10·256/c).
  *
  * `BandMass <sfDir> [<sfDir> ...]` — prints one JSON line per corpus:
  * per cap, the admitted candidate mass, the surviving/dropped bucket
  * counts, the dropped mass, and the analytic envelope
  * n_buckets_surviving · C(cap,2) that upper-bounds the admitted mass
  * of capped-size buckets.
  */
object BandMass {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BandMass <sfDir> [<sfDir> ...]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val caps = Seq(32L, 64L, 128L, 256L, 512L, Long.MaxValue)
    // `--windows` profiles the containment WINDOW-GRID banding
    // (windowBandBucketSizeHist) instead of the document banding
    val windows = args.contains("--windows")
    for (d <- args.filterNot(_ == "--windows")) {
      val docs = Tables.documents(spark, d)
      val nDocs = docs.count()
      // (sz, n_buckets) — a few thousand distinct sizes at most
      val hist = (if (windows)
          graft.dedup.Dedup.windowBandBucketSizeHist(docs)
        else graft.dedup.Dedup.bandBucketSizeHist(docs))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val capsJson = caps.map { cap =>
        val (surv, dropped) = hist.partition(_._1 <= cap)
        val mass = surv.map { case (sz, n) => n * (sz * (sz - 1) / 2) }.sum
        val droppedMass =
          dropped.map { case (sz, n) => n * (sz * (sz - 1) / 2) }.sum
        val nSurv = surv.map(_._2).sum
        val nDrop = dropped.map(_._2).sum
        val capName = if (cap == Long.MaxValue) "inf" else cap.toString
        val envelope =
          if (cap == Long.MaxValue) -1L else nSurv * (cap * (cap - 1) / 2)
        s""""$capName":{"mass":$mass,"dropped_mass":$droppedMass,""" +
          s""""n_buckets":$nSurv,"n_dropped_buckets":$nDrop,""" +
          s""""envelope":$envelope}"""
      }.mkString(",")
      val maxSz = if (hist.isEmpty) 0L else hist.map(_._1).max
      println(s"""{"sf":"$d","n_docs":$nDocs,"max_bucket":$maxSz,""" +
        s""""caps":{$capsJson}}""")
    }
    spark.stop()
  }
}
