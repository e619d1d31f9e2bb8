package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Pre-flight scale diagnostics: the queries an engineer runs BEFORE
  * committing a 100 TB join/shuffle, to know whether it will finish.
  * Both are single-pass key-count aggregates — the diagnostic must be
  * orders of magnitude cheaper than the operation it de-risks.
  */
object Diagnostics {
  import org.apache.spark.sql.DataFrame

  /** Top-k heaviest keys of `keyCol` with their share of total rows. */
  def skewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("_tot"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("n"),
        round(col("n") / col("_tot"), 8).as("share"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
  }

  /** Exact output cardinality a `keyCol`-keyed self-join would produce. */
  def joinSizeProbe(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(keyCol).agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n") * col("n")).as("est_pairs"),
        max(col("n") * col("n")).as("max_key_pairs"))
      .select(col("n_keys"), col("est_pairs"), col("max_key_pairs"),
        round(col("max_key_pairs") / col("est_pairs"), 8)
          .as("hottest_share"))

  val defs: Map[String, QueryDef] = Map(

    // C69 — hot-key skew report: the top-20 heaviest join/shuffle keys
    // with their share of total rows. A key with share ≫ 1/partitions
    // is the one that strands a 1000-executor job on one straggler —
    // this report is what decides between a plain shuffle join, a
    // broadcast, and salting (C32/C55). One partial-first aggregate;
    // the total is a 1-row broadcast, never a driver collect.
    "skew_report" -> QueryDef(
      (s, d) => skewReport(Tables.events(s, d), "user_id", 20),
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
         SELECT user_id, n,
                round(n / (SELECT sum(n) FROM c), 8) AS share
         FROM c ORDER BY n DESC, user_id LIMIT 20"""),

    // C70 — self-join cardinality probe: exact output size a user-keyed
    // self-join (sessionization pairs, co-occurrence, interval join)
    // WOULD produce — sum over keys of n², plus the hottest key's
    // contribution. At 100 TB this one cheap aggregate is the
    // difference between discovering a 10^14-row blow-up in a 30-second
    // probe and discovering it three hours into the join itself.
    "join_size_probe" -> QueryDef(
      (s, d) => joinSizeProbe(Tables.events(s, d), "user_id"),
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
         SELECT count(*) AS n_keys,
                CAST(sum(n * n) AS BIGINT) AS est_pairs,
                CAST(max(n * n) AS BIGINT) AS max_key_pairs,
                round(max(n * n) / sum(n * n), 8) AS hottest_share
         FROM c""")
  )
}
