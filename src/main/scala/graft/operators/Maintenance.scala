package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Table-maintenance operators (SURVEY §2 A20/C56): CDC upsert apply
  * (the batch MERGE a Firehose-landed change stream needs to maintain a
  * queryable current-state table) and multi-dimension z-order layout
  * (the OPTIMIZE-style clustering that makes min/max data skipping work
  * on two filter columns at once).
  */
object Maintenance {

  val defs: Map[String, QueryDef] = Map(

    // A20 — CDC apply: merge the latest change per key into a base
    // table (insert / update / unchanged per key). Both sides are
    // corpus-sized, so this is a plain shuffled full-outer join on the
    // key — no broadcast assumption anywhere. The latest-change
    // collapse is the same argmax the DynamoDB view uses.
    "cdc_apply" -> QueryDef(
      (s, d) => {
        val base = Tables.customer(s, d)
          .filter(col("c_custkey") >= 50 && col("c_custkey") < 300)
          .select(col("c_custkey").as("key"),
            round(col("c_acctbal"), 4).as("old_value"))
        val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
        val changes = Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id").as("ckey"),
            round(col("value"), 4).as("chg_value"))
        base.join(changes, col("key") === col("ckey"), "full_outer")
          .select(
            coalesce(col("key"), col("ckey")).as("key"),
            when(col("key").isNull, lit("insert"))
              .when(col("ckey").isNull, lit("unchanged"))
              .otherwise(lit("update")).as("op"),
            coalesce(col("chg_value"), col("old_value")).as("new_value"))
          .orderBy("key")
      },
      """WITH base AS (
           SELECT c_custkey AS key, round(c_acctbal, 4) AS old_value
           FROM customer WHERE c_custkey >= 50 AND c_custkey < 300),
         chg AS (
           SELECT user_id AS ckey, round(value, 4) AS chg_value
           FROM (SELECT user_id, value,
                        row_number() OVER (PARTITION BY user_id
                                           ORDER BY event_id DESC) AS rn
                 FROM events) t
           WHERE rn = 1)
         SELECT coalesce(b.key, c.ckey) AS key,
                CASE WHEN b.key IS NULL THEN 'insert'
                     WHEN c.ckey IS NULL THEN 'unchanged'
                     ELSE 'update' END AS op,
                coalesce(c.chg_value, b.old_value) AS new_value
         FROM base b FULL OUTER JOIN chg c ON b.key = c.ckey
         ORDER BY key"""),

    // C56 — z-order clustering key: interleave the low 8 bits of two
    // filter columns into one 16-bit Morton code, then show the layout
    // payoff — per-z-bucket min/max ranges stay narrow on BOTH
    // dimensions, which is exactly the property parquet min/max
    // data skipping exploits after an OPTIMIZE ZORDER-style rewrite.
    // Pure codegen'd integer arithmetic, no shuffle beyond the final
    // 16-row aggregate.
    "zorder_key" -> QueryDef(
      (s, d) => {
        val x = pmod(col("l_partkey"), lit(256L))
        val y = pmod(col("l_suppkey"), lit(256L))
        val z = (0 until 8).map { i =>
          shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
            shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
        }.reduce(_ + _)
        Tables.lineitem(s, d)
          .select(x.as("x"), y.as("y"), z.as("z"))
          .withColumn("bucket", floor(col("z") / 4096).cast("long"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            min("x").as("min_x"), max("x").as("max_x"),
            min("y").as("min_y"), max("y").as("max_y"))
          .orderBy("bucket")
      },
      """WITH t AS (
           SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y
           FROM lineitem),
         zc AS (
           SELECT x, y,
                  ((x >> 0) & 1) * 2     + ((y >> 0) & 1) * 1 +
                  ((x >> 1) & 1) * 8     + ((y >> 1) & 1) * 4 +
                  ((x >> 2) & 1) * 32    + ((y >> 2) & 1) * 16 +
                  ((x >> 3) & 1) * 128   + ((y >> 3) & 1) * 64 +
                  ((x >> 4) & 1) * 512   + ((y >> 4) & 1) * 256 +
                  ((x >> 5) & 1) * 2048  + ((y >> 5) & 1) * 1024 +
                  ((x >> 6) & 1) * 8192  + ((y >> 6) & 1) * 4096 +
                  ((x >> 7) & 1) * 32768 + ((y >> 7) & 1) * 16384 AS z
           FROM t)
         SELECT z // 4096 AS bucket, count(*) AS n,
                min(x) AS min_x, max(x) AS max_x,
                min(y) AS min_y, max(y) AS max_y
         FROM zc GROUP BY 1 ORDER BY bucket"""))

  /** Partition-retention sweep (the TTL policy every partitioned lake
    * table runs: Firehose keeps landing `day=...` directories forever
    * until something deletes the expired ones). PURE METADATA work — it
    * lists the table's first-level partition directories and drops the
    * ones whose partition VALUE is lexicographically below the cutoff
    * (ISO dates order correctly as strings); no data file is ever
    * opened, so cost scales with partition count, not table bytes —
    * exactly how a catalog DROP PARTITION behaves at 100 TB. Returns
    * the dropped partition values (only those fs.delete actually
    * removed — a false return is a silent-failure partition that must
    * NOT be reported as swept). Directory names are Hive-path-escaped
    * (`%XX` for special chars), so the value is unescaped BEFORE the
    * lexicographic compare: `day=2024%2D01%2D01` must sort as
    * `2024-01-01`, not as the raw escaped string. Spec-verified
    * (ScaleSpec): expired partitions vanish, survivors' bytes are
    * untouched, and the table stays readable with the same schema.
    */
  def retentionSweep(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, partitionCol: String,
      dropBelow: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val prefix = s"$partitionCol="
    fs.listStatus(new org.apache.hadoop.fs.Path(tableDir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(st => (st.getPath,
        unescapePartitionValue(st.getPath.getName.stripPrefix(prefix))))
      .filter { case (_, v) => v < dropBelow }
      .sortBy(_._2)
      .collect { case (p, v) if fs.delete(p, true) => v }
  }

  /** Reverse of Hive's partition-path escaping: `%XX` hex pairs back
    * to their characters (the encoding `saveAsTable`/insert writes for
    * `/ : =` etc. in partition values). Malformed `%` sequences pass
    * through untouched rather than throwing — a directory we cannot
    * decode should simply never match the drop predicate.
    */
  private[graft] def unescapePartitionValue(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // both escape chars must be literal hex digits: parseInt alone
      // also accepts signed forms ("%+3"/"%-5"), which would decode
      // malformed names into control chars that sort BELOW the cutoff
      // and get a merely-misnamed partition deleted
      def isHex(ch: Char) =
        (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') ||
          (ch >= 'A' && ch <= 'F')
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
