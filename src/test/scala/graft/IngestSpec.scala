package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{EventCodec, Fanout, PartitionedSink, SyntheticOrders}

class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("codec round trip preserves every field at all nesting levels") {
    val nested = SyntheticOrders.nested(spark, sf)
    val roundTripped = EventCodec.decode(EventCodec.encode(nested))
    // identical schema (column names + order come from the codec schema)
    assert(roundTripped.schema.fieldNames.toSeq == nested.schema.fieldNames.toSeq)
    // value-identical: anti-joins empty both ways on the JSON form
    val a = nested.select(to_json(struct(nested.columns.map(col).toIndexedSeq: _*)).as("j"))
    val b = roundTripped.select(to_json(struct(roundTripped.columns.map(col).toIndexedSeq: _*)).as("j"))
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("decode tolerates malformed records as nulls (poison-pill safety)") {
    import spark.implicits._
    val bad = Seq("not-base64!!!", "aGVsbG8=" /* valid b64, not JSON */)
      .toDF("data")
    val out = EventCodec.decode(bad)
    assert(out.count() == 2)
    assert(out.filter(col("order_id").isNull).count() == 2)
  }

  test("order_date stays in the fixed ISO form the catalog's substring keys assume") {
    // round-15 advice item: IngestQueries.catalogTables derives the
    // year/month partition values as substring(order_date, 1, 4) /
    // (6, 2), which silently couples to SyntheticOrders.build's
    // "yyyy-MM-dd'T'HH:mm:ss'Z'" format — a producer format change
    // would emit WRONG partition values with no error. This assertion
    // is the cheap format gate: every produced order_date must match
    // the fixed-width pattern, and the substring-derived keys must
    // equal the date_format derivation they replaced.
    val nested = SyntheticOrders.nested(spark, sf)
    assert(nested.filter(
      !col("order_date").rlike(
        "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}Z$")).count() == 0,
      "order_date left the producer's fixed ISO format")
    val ts = to_timestamp(regexp_replace(col("order_date"), "Z$", ""))
    assert(nested.filter(
      substring(col("order_date"), 1, 4) =!= date_format(ts, "yyyy") ||
        substring(col("order_date"), 6, 2) =!= date_format(ts, "MM"))
      .count() == 0,
      "substring partition keys diverged from the date_format derivation")
  }

  test("productDetails explode count equals sum of array sizes") {
    val nested = SyntheticOrders.nested(spark, sf)
    val expected = nested.agg(sum(size(col("product_details")))).head.getLong(0)
    assert(Fanout.productDetails(nested).count() == expected)
  }

  test("dead-letter routing splits good and malformed wire records") {
    import spark.implicits._
    val goodData = EventCodec.encode(SyntheticOrders.nested(spark, sf))
    val mixed = goodData.union(
      Seq("!!!not-base64!!!", "aGVsbG8=" /* b64 of non-JSON */).toDF("data"))
    val (good, bad) = EventCodec.decodeWithDlq(mixed)
    assert(good.count() == goodData.count())
    assert(bad.count() == 2)
    assert(bad.columns.toSeq == Seq("data")) // raw payload preserved for replay
  }

  test("compaction rewrites many small files into few, preserving rows") {
    val inDir = Files.createTempDirectory("graft-frag").toString
    val outDir = Files.createTempDirectory("graft-compact").toString
    val orders = Tables.orders(spark, sf)
    orders.repartition(37).write.mode("overwrite").parquet(inDir)
    val before = new java.io.File(inDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(before >= 37)
    graft.ingest.Compaction.compact(spark, inDir, outDir,
      targetBytes = 8L * 1024 * 1024, clusterBy = Seq("o_custkey"))
    val after = new java.io.File(outDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(after < before / 4, s"$before -> $after files")
    assert(spark.read.parquet(outDir).count() == orders.count())
  }

  test("decode tolerates schema evolution: unknown fields ignored, missing fields null") {
    // schema-on-read evolution: a producer that ADDS a field must not
    // break existing consumers, and one that omits optional fields must
    // yield nulls, not failures — the Glue-schema-registry contract
    // re-expressed as from_json semantics
    import spark.implicits._
    val withExtra =
      """{"order_id":"oX","status":"NEW","future_field":{"a":1}}"""
    val sparse = """{"order_id":"oY"}"""
    val wire = Seq(withExtra, sparse).toDF("json")
      .select(base64(col("json").cast("binary")).as("data"))
    val out = EventCodec.decode(wire)
      .select("order_id", "status", "customer_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSet == Set(("oX", "NEW", null), ("oY", null, null)))
  }

  test("csv sink round-trips a query result (Athena result-export analog)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val res = SparkEntry.queries("ref_sales_by_country")(spark, sf)
    res.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(res.schema).csv(dir)
    assert(back.count() == res.count())
    assert(back.columns.toSeq == res.columns.toSeq)
  }

  test("json-lines source reads wire events with the explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    val nested = SyntheticOrders.nested(spark, sf)
    nested.write.mode("overwrite").json(dir)
    val back = spark.read.schema(EventCodec.orderEventSchema).json(dir)
    assert(back.count() == nested.count())
    assert(Fanout.productDetails(back).count() ==
      Fanout.productDetails(nested).count())
  }

  test("partitioned sink writes firehose-style directory layout") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val orders = Fanout.withPartitionKeys(
      Fanout.orders(SyntheticOrders.nested(spark, sf)),
      to_timestamp(col("order_date")))
    PartitionedSink.write(orders, dir,
      partitionCols = Seq("year", "month"), clusterCols = Seq("customer_id"))
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    // layout: year=YYYY/month=MM directories exist
    val years = new java.io.File(dir).list().filter(_.startsWith("year="))
    assert(years.nonEmpty)
    // partition columns survive as readable columns
    assert(back.columns.contains("year") && back.columns.contains("month"))
  }

  test("catalog table serves partition-pruned reads by name") {
    // the reason a Glue-style catalog matters at 100 TB: a predicate on
    // the partition keys must prune at the METADATA level — the scan
    // plans only the matching year=/month= directories, never listing
    // the rest of the table
    SparkEntry.queries("catalog_roundtrip")(spark, sf).collect()
    val parts = spark.sql("SHOW PARTITIONS graft_orders_by_name")
      .collect().map(_.getString(0))
    assert(parts.length > 1, s"need >1 partition, got ${parts.toSeq}")
    // pick a real partition dynamically (date span depends on SF)
    val kv = parts.head.split("/").map(_.split("=")).map(a => a(0) -> a(1)).toMap
    val q = spark.sql("SELECT count(*) AS n FROM graft_orders_by_name " +
      s"WHERE year = '${kv("year")}' AND month = '${kv("month")}'")
    val n = q.collect().head.getLong(0)
    assert(n > 0)
    // sparkPlan, not executedPlan: AQE wraps stages and hides the scan
    // from a plain collect
    val scan = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // the partition predicate must reach the scan as a partition filter
    // (metadata pruning), NOT as a data filter over all files
    assert(scan.partitionFilters.map(_.toString).mkString(",").contains("year"),
      s"no partition filter in scan: ${scan.partitionFilters}")
    // the catalog scan's file index is already pruned by the optimizer
    // (PruneFileSourcePartitions), so compare against the TABLE's real
    // file population on disk
    val root = new java.io.File(
      graft.Tables.scratchDir(spark, sf, "glue") + "/orders")
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles.map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    assert(walk(root) > scan.selectedPartitions.totalNumberOfFiles,
      "scan did not prune: every file of the table was selected")
  }

  test("all four fan-out sinks are registered and queryable by name") {
    // the reference registers FOUR Glue tables (terraform/main.tf), one
    // per Firehose sink; catalog_join's gate result only reads two of
    // them, so this spec proves the other two registrations serve
    // path-twin row counts by name — and that the shipping table's
    // country partition values (strings with spaces) round-trip the
    // directory encoding verbatim
    SparkEntry.queries("catalog_join")(spark, sf).collect()
    val nested = graft.ingest.SyntheticOrders.nested(spark, sf)
    val expect = Map(
      "graft_cat_orders" -> nested.count(),
      "graft_cat_product_details" ->
        graft.ingest.Fanout.productDetails(nested).count(),
      "graft_cat_purchase_details" -> nested.count(),
      "graft_cat_shipping_addresses" -> nested.count())
    expect.foreach { case (t, n) =>
      val got = spark.sql(s"SELECT count(*) AS n FROM $t")
        .collect().head.getLong(0)
      assert(got == n, s"$t by-name count $got != path twin $n")
    }
    val countries = spark.sql(
      "SELECT DISTINCT country FROM graft_cat_shipping_addresses")
      .collect().map(_.getString(0)).toSet
    val fromPath = graft.ingest.Fanout.shippingAddresses(nested)
      .select("country").distinct().collect().map(_.getString(0)).toSet
    assert(countries == fromPath,
      s"partition-served country values diverge: ${countries.diff(fromPath)} / ${fromPath.diff(countries)}")
  }

  test("the five reference analytics queries run by table name through the catalog") {
    // the full Athena-surface story: base tables registered in the
    // catalog, the reference's five analytics queries (B1-B5) executed
    // BY NAME through plain SQL — results must equal the path-based
    // DataFrame twins row for row. (The oracle SQL doubles as the
    // by-name query text: it is engine-portable ANSI.)
    val tables = Seq("orders", "lineitem", "part", "customer", "nation",
      "events")
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING PARQUET LOCATION '$sf/$t.parquet'")
    }
    try {
      for (key <- Seq("ref_avg_order_value", "ref_top_products",
        "ref_order_customer", "ref_income_by_type", "ref_sales_by_country")) {
        val byName = spark.sql(SparkEntry.oracleSql(key))
          .collect().map(_.toString).sorted.toSeq
        val byPath = SparkEntry.queries(key)(spark, sf)
          .collect().map(_.toString).sorted.toSeq
        assert(byName == byPath, s"$key: by-name result diverges from by-path")
      }
    } finally tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
