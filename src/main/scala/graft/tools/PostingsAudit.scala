package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 verdict item 7: the exact pair graph's per-key candidate
  * mass, measured — `sharedPairs`' inverted-index self-join emits
  * df·(df−1) candidate rows per shingle, and the auto-dispatch budget
  * excludes shingles with df > cap = max(1000, n_docs/1000) from the
  * "spent" sum. This main prints, for each corpus: n_docs, the cap,
  * the top-N hottest shingles by df with their masses, and the total
  * mass split at the cap — so the claim "the band budget bounds the
  * hottest key at decade shape" is a committed measurement instead of
  * an assertion.
  *
  * Usage: runMain graft.tools.PostingsAudit <sfDir> [<sfDir> ...]
  */
object PostingsAudit {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- args) {
      val docs = graft.Tables.documents(spark, d)
      val nDocs = docs.count()
      val cap = math.max(1000L, nDocs / 1000L)
      val df = graft.dedup.Dedup.postings(docs)
        .groupBy("s").agg(count(lit(1)).as("df"))
      val split = df.agg(
        sum(when(col("df") <= cap, col("df") * (col("df") - 1))
          .otherwise(0L)).as("mass_below_cap"),
        sum(when(col("df") > cap, col("df") * (col("df") - 1))
          .otherwise(0L)).as("mass_above_cap"),
        count(when(col("df") > cap, 1)).as("n_hot_keys"),
        max("df").as("max_df"),
        count(lit(1)).as("n_keys")).head()
      println(s"[postingsaudit] corpus=$d n_docs=$nDocs cap=$cap " +
        s"n_keys=${split.getLong(4)} max_df=${split.getLong(3)} " +
        s"n_hot_keys=${split.getLong(2)} " +
        s"mass_below_cap=${split.getLong(0)} " +
        s"mass_above_cap_excluded=${split.getLong(1)} " +
        s"hottest_admitted_key_mass<=${cap * (cap - 1)}")
      println("[postingsaudit] top-20 keys by df (df, mass):")
      df.orderBy(desc("df"), asc("s")).limit(20).collect().foreach { r =>
        val v = r.getLong(1)
        println(f"[postingsaudit]   df=$v%8d mass=${v * (v - 1)}%14d " +
          s"admitted=${v <= cap}")
      }
    }
    spark.stop()
  }
}
