package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FileRecordSource, JsonlRecordSource, KafkaRecordSource,
  KinesisRecordSource}

/** The source-adapter seam: any RecordSource yields the same decoded
  * event stream, so the fan-out pipeline is source-agnostic. The
  * file-backed adapter (also the S3-archive replay path) carries the
  * runtime parity proof; the Kafka/Kinesis bindings are compile-checked
  * shapes whose connectors don't exist in this sandbox.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("file record source streams wire records that decode to the batch events") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wire").toString
    FileRecordSource.stage(spark, sf, dir)

    // wire shape: every staged record carries key + payload + arrival ts
    val staged = spark.read.parquet(dir)
    assert(staged.columns.sorted.toSeq == Seq("arrival_ts", "data", "partition_key"))
    assert(staged.filter(col("data").isNull || col("partition_key").isNull).count() == 0)

    val decoded = graft.streaming.StreamQueries.runToMemory(
      FileRecordSource(dir).events(spark), "append")
      .select("order_id", "status", "customer_id")
    val batch = graft.ingest.SyntheticOrders.nested(spark, sf)
      .select("order_id", "status", "customer_id")
    val got = decoded.collect().map(_.toString).sorted.toSeq
    val want = batch.collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("jsonl archive source replays to the same decoded events") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    JsonlRecordSource.stage(spark, sf, dir)
    // the archive really is newline-delimited JSON text
    val firstLine = spark.read.text(dir).head.getString(0)
    assert(firstLine.startsWith("{") && firstLine.contains("\"data\""))
    val decoded = graft.streaming.StreamQueries.runToMemory(
      JsonlRecordSource(dir).events(spark), "append")
      .select("order_id", "status", "customer_id")
    assert(decoded.collect().map(_.toString).sorted.toSeq == batchReference)
  }

  test("connector bindings normalize to the shared record shape") {
    // construction is pure config; no connector jar is loaded until
    // stream() is called, which this sandbox cannot do
    val kafka = KafkaRecordSource("broker:9092", "orders")
    val kinesis = KinesisRecordSource("orders-stream", "eu-west-1")
    assert(kafka.topic == "orders" && kinesis.streamName == "orders-stream")
  }

  /** Reference decode of the same wire records through the proven
    * file-replay path, for the connector-shape parity checks below. */
  private def batchReference = graft.ingest.SyntheticOrders.nested(spark, sf)
    .select("order_id", "status", "customer_id")
    .collect().map(_.toString).sorted.toSeq

  test("kafka normalization is runtime-proven against the connector's wire schema") {
    // the kafka source's output schema is FIXED by the connector, so
    // everything this binding owns (normalize → decode → fan-out) runs
    // for real against records staged in exactly that shape; only the
    // broker transport (.format("kafka").load()) stays compile-checked
    val dir = java.nio.file.Files.createTempDirectory("graft-kafka-wire").toString
    FileRecordSource.wireRecords(spark, sf)
      .select(
        col("partition_key").cast("binary").as("key"),
        col("data").cast("binary").as("value"),
        lit("orders").as("topic"),
        lit(0).as("partition"),
        monotonically_increasing_id().as("offset"),
        col("arrival_ts").as("timestamp"),
        lit(0).as("timestampType"))
      .write.mode("overwrite").parquet(dir)
    val records = spark.readStream
      .schema(KafkaRecordSource.connectorSchema)
      .parquet(dir)
    val decoded = graft.streaming.StreamQueries.runToMemory(
      graft.ingest.EventCodec.decode(KafkaRecordSource.normalize(records)),
      "append")
      .select("order_id", "status", "customer_id")
    assert(decoded.collect().map(_.toString).sorted.toSeq == batchReference)
  }

  test("kinesis normalization is runtime-proven against the connector's wire schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kinesis-wire").toString
    FileRecordSource.wireRecords(spark, sf)
      .select(
        col("partition_key").as("partitionKey"),
        col("data").cast("binary").as("data"),
        lit("orders-stream").as("streamName"),
        format_string("seq-%012d", monotonically_increasing_id())
          .as("sequenceNumber"),
        col("arrival_ts").as("approximateArrivalTimestamp"))
      .write.mode("overwrite").parquet(dir)
    val records = spark.readStream
      .schema(KinesisRecordSource.connectorSchema)
      .parquet(dir)
    val decoded = graft.streaming.StreamQueries.runToMemory(
      graft.ingest.EventCodec.decode(KinesisRecordSource.normalize(records)),
      "append")
      .select("order_id", "status", "customer_id")
    assert(decoded.collect().map(_.toString).sorted.toSeq == batchReference)
  }

  test("kafka transport line end-to-end against a live broker") {
    // The `.format("kafka").load()` line itself needs the
    // spark-sql-kafka connector jar plus an embedded/live broker;
    // NEITHER is present in this environment (no network egress, no
    // kafka artifacts in /opt/spark/jars or the offline coursier
    // cache — verified by classpath probe below). Everything this
    // binding owns short of the transport line IS runtime-proven
    // above: normalize() is exercised against the connector's exact
    // documented output schema (key/value/topic/partition/offset/
    // timestamp), then decode → fan-out runs as a real stream. If
    // connector jars become available, replace this cancellation with
    // an embedded-broker round trip feeding the same assertions.
    val kafkaOnClasspath =
      try { Class.forName("org.apache.kafka.clients.producer.KafkaProducer"); true }
      catch { case _: ClassNotFoundException => false }
    assume(kafkaOnClasspath,
      "env-blocked: kafka-clients + spark-sql-kafka jars unavailable " +
        "offline; transport line is compile-checked, normalize onward " +
        "is runtime-proven in the tests above")
    succeed
  }
}
