package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-2 catalog extensions (SURVEY §2 C46–C54, D21): grouping sets,
  * RANGE window frames, nested-aggregate TPC-H shapes (Q17/Q18/Q22
  * flavors), SCD2 history construction, higher-order array functions,
  * corpus token extraction, and scalable global row numbering.
  */
object Relational4 {

  /** Global ordered row numbering WITHOUT a single-reducer global
    * window: `row_number() over (order by k)` plans one partition — the
    * classic 100 TB bottleneck. Instead: range-repartition on the sort
    * key (so partition i's keys all precede partition i+1's), number
    * rows within each partition, and add per-partition offsets. The
    * offsets come from a #partitions-row count aggregate collected
    * driver-side (the `RDD.zipWithIndex` pattern — bounded by the
    * partition count, never the data) and re-emitted as a literal map
    * expression, so no window or join touches the plan at all. Ties
    * across a range boundary would be numbered nondeterministically —
    * callers pass a unique key.
    */
  def withGlobalIndex(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    // Width follows the DATA, not a constant (round 16, guide §2
    // "scale-adaptive partitioning"): repartitionByRange WITHOUT an
    // explicit count starts from spark.sql.shuffle.partitions and lets
    // AQE coalesce adjacent ranges down to the advisory partition size.
    // Round 15 pinned width to max(8, defaultParallelism), which at
    // local[32] gave every tiny frame 32 range partitions + 32
    // checkpoint blocks per pass — rfm_segments (3 sequential passes on
    // a 5k-row frame) measured 3.0 s at 32 cores vs 1.2 s at 8, and
    // ks_drift 6.1 s vs 0.7 s, pure per-partition fixed cost. AQE
    // coalescing keeps small frames narrow and big frames wide; range
    // CONTIGUITY is preserved by coalescing (adjacent partitions merge),
    // and the emitted rank is partition-count-INVARIANT anyway: callers
    // pass a total order (unique tiebreaker column), so a row's global
    // rank is its position in that order no matter where the range
    // boundaries fall — proven by the unchanged oracle hashes.
    // materialize the ranged layout ONCE: RangePartitioner samples its
    // boundaries per-RDD, so evaluating this subtree twice (offset
    // counts + final numbering) could assign the same row to different
    // partitions and corrupt the numbering
    val ranged = df
      .repartitionByRange(sortCols.map(col): _*)
      .withColumn("_pid", spark_partition_id())
    val checkpointed = graft.Materialize.cut(ranged)
    val counts = checkpointed.groupBy("_pid").agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init).toMap
    val wInPart = Window.partitionBy("_pid")
      .orderBy(sortCols.map(c => col(c).asc): _*)
    checkpointed
      .withColumn("rn",
        row_number().over(wInPart).cast("long") +
          element_at(typedlit(offsets), col("_pid")))
      .drop("_pid")
  }

  val defs: Map[String, QueryDef] = Map(

    // C49 — Q17 flavor: rows under half their group's average, against
    // a broadcast of per-group averages (the decorrelated plan).
    // l_quantity is integer-valued, so the per-part averages are exact
    // in both engines and the < comparison cannot flip on a ulp.
    "q17_small_qty" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_partkey", "l_quantity", "l_extendedprice")
        val half = li.groupBy(col("l_partkey").as("h_partkey"))
          .agg((avg("l_quantity") * 0.5).as("half_avg"))
        // money fold in exact decimal (the decimal_sum discipline): a
        // double sum of ~1e10 magnitude rounded at 4 dp needs 15
        // significant digits — beyond double's order-independent range,
        // so partition-order vs sequential summation diverged at the
        // sf1 scale step. Decimal addition is associative; the single
        // double division/round at the end starts from the identical
        // exact value on both engines.
        li.join(broadcast(half), col("l_partkey") === col("h_partkey"))
          .filter(col("l_quantity") < col("half_avg"))
          .agg(round(
            sum(col("l_extendedprice").cast("decimal(18,4)"))
              .cast("decimal(28,4)").cast("double") / 7.0, 4)
            .as("avg_yearly"),
            count(lit(1)).as("n_lines"))
      },
      """WITH a AS (SELECT l_partkey, avg(l_quantity) * 0.5 AS half_avg
                    FROM lineitem GROUP BY 1)
         SELECT round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                               AS DECIMAL(28,4)) AS DOUBLE) / 7.0, 4)
                  AS avg_yearly,
                count(*) AS n_lines
         FROM lineitem JOIN a USING (l_partkey)
         WHERE l_quantity < half_avg"""),

    // C50 — Q18 flavor: HAVING over a grouped fact, joined back to the
    // order + broadcast customer dims. Quantity sums are exact.
    "q18_large_orders" -> QueryDef(
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum("l_quantity").as("total_qty"))
          .filter(col("total_qty") > 250)
        big.join(Tables.orders(s, d)
            .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_name")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"), col("total_qty"))
          .orderBy("o_orderkey")
      },
      """SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
         FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
               FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250) big
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey"""),

    // C51 — Q22 flavor: scalar-subquery threshold + anti join + agg:
    // above-average-balance customers with no urgent orders, by segment.
    "q22_no_urgent" -> QueryDef(
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select("c_custkey", "c_mktsegment", "c_acctbal")
        val avgBal = cust.filter(col("c_acctbal") > 0)
          .agg(avg("c_acctbal").as("avg_bal"))
        val urgent = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        cust.join(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"),
            round(sum("c_acctbal"), 4).as("total_bal"))
          .orderBy("c_mktsegment")
      },
      """SELECT c_mktsegment, count(*) AS n_cust,
                round(sum(c_acctbal), 4) AS total_bal
         FROM customer
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                            WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         GROUP BY c_mktsegment ORDER BY c_mktsegment"""),

    // C46 — explicit GROUPING SETS (beyond rollup/cube), with grouping
    // flags disambiguating real NULLs from grouped-out columns.
    "grouping_sets_sales" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
            grouping(col("o_orderpriority")).cast("int").as("g_priority"),
            count(lit(1)).as("n"),
            // exact long-cents money sum (q1_agg discipline)
            (sum(Tables.cents(col("o_totalprice")))
              .cast("double") / 100.0).as("total"))
          .orderBy("o_orderstatus", "o_orderpriority"),
      """SELECT o_orderstatus, o_orderpriority,
                CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
                CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
                count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     AS DOUBLE) / 100.0 AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         ORDER BY o_orderstatus, o_orderpriority"""),

    // C47 — RANGE window frame: per-event rolling 1-hour sum/count per
    // user, frame bounded by VALUE (microseconds), not row count.
    "window_range_frame" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("_tsus", unix_micros(col("ts")))
        val w = Window.partitionBy("user_id").orderBy(col("_tsus"))
          .rangeBetween(-3600000000L, 0)
        ev.select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_last_hour"),
            round(sum("value").over(w), 4).as("value_last_hour"))
          .orderBy("event_id")
      },
      """SELECT event_id, user_id,
                count(*) OVER w AS n_last_hour,
                round(sum(value) OVER w, 4) AS value_last_hour
         FROM events
         WINDOW w AS (PARTITION BY user_id
                      ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id"""),

    // C48 — fixed-width histogram: bucket arithmetic is the same double
    // op on both engines, so boundaries agree bit-for-bit.
    "histogram_prices" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(floor(col("o_totalprice") / 50000).cast("bigint")
            .as("bucket"))
          .agg(count(lit(1)).as("n"),
            // exact long-cents money sum (q1_agg discipline)
            (sum(Tables.cents(col("o_totalprice")))
              .cast("double") / 100.0).as("total"))
          .orderBy("bucket"),
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
                count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     AS DOUBLE) / 100.0 AS total
         FROM orders GROUP BY 1 ORDER BY bucket"""),

    // C52 — SCD2 history: each order's validity interval per customer,
    // closed by the next order (lead), open for the latest.
    "scd2_history" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("valid_from").asc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_orderdate").as("valid_from"))
          .withColumn("valid_to", lead("valid_from", 1).over(w))
          .withColumn("is_current", col("valid_to").isNull.cast("int"))
          .orderBy("o_custkey", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
                lead(o_orderdate) OVER
                  (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS valid_to,
                CAST(lead(o_orderdate) OVER
                  (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) IS NULL AS INT)
                  AS is_current
         FROM orders ORDER BY o_custkey, o_orderkey"""),

    // C53 — higher-order array functions (transform/filter/aggregate)
    // over the embedding column; all accumulation in double on both
    // sides (DuckDB's float32 list accumulation diverges otherwise).
    "array_hof" -> QueryDef(
      (s, d) =>
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            round(
              aggregate(
                filter(transform(col("embedding"), x => x.cast("double")),
                  x => x > 0),
                lit(0.0), (acc, x) => acc + x), 4).as("pos_sum"),
            size(filter(col("embedding"), x => x < 0)).cast("bigint")
              .as("n_neg"))
          .orderBy("vec_id"),
      """SELECT vec_id,
                round(coalesce(list_sum(
                  list_filter([CAST(x AS DOUBLE) for x in embedding],
                              x -> x > 0)), 0.0), 4) AS pos_sum,
                CAST(len(list_filter(embedding, x -> x < 0)) AS BIGINT)
                  AS n_neg
         FROM embeddings ORDER BY vec_id"""),

    // D21 — corpus token extraction: regexp_extract_all + explode +
    // global count, deterministic top-20 (count desc, token asc).
    "extract_long_words" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(explode(regexp_extract_all(col("text"),
            lit("[a-z]{6,}"), lit(0))).as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok").asc)
          .limit(20),
      """SELECT tok, count(*) AS n
         FROM (SELECT unnest(regexp_extract_all(text, '[a-z]{6,}')) AS tok
               FROM documents) t
         GROUP BY tok ORDER BY n DESC, tok LIMIT 20"""),

    // C54 — global row numbering at scale (no single-reducer sort).
    "global_rownum" -> QueryDef(
      (s, d) =>
        withGlobalIndex(
          Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
          Seq("o_orderkey"))
          .select("o_orderkey", "rn")
          .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                row_number() OVER (ORDER BY o_orderkey) AS rn
         FROM orders ORDER BY o_orderkey"""))
}
