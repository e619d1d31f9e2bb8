package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: one local JVM-wide SparkSession with the
  * same configs the driver-facing mains use.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Catalog-wide invariants: every query runs, every oracle key exists,
  * column names are stable and lowercase-unique (the driver sorts columns
  * by name before hashing).
  */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs at sf0.001 and has sane columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sf)
      val cols = df.columns.toSeq
      assert(cols.nonEmpty, s"$name: no columns")
      assert(cols.distinct.size == cols.size, s"$name: duplicate columns $cols")
      assert(df.count() >= 0, s"$name: failed to execute")
    }
  }

  test("flagship analytics queries return non-empty results") {
    for (name <- Seq("ref_avg_order_value", "ref_top_products",
        "ref_order_customer", "ref_income_by_type", "ref_sales_by_country",
        "q1_agg", "q6_filter", "topk_orders", "window_running",
        "semi_join", "anti_join", "outer_join", "distinct_segments",
        "rollup_sales", "pivot_status", "union_keys", "events_hourly")) {
      assert(SparkEntry.queries(name)(spark, TestSpark.sf).count() > 0,
        s"$name returned 0 rows")
    }
  }
}
