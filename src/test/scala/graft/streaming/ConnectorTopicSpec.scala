package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the broker-less halves of [[ConnectorTopic]] (the real-connector
  * S1 seam): the option translation against SURVEY §8's documented
  * mapping table, and the JSON wire envelope round-trip — everything
  * except the actual broker IO, which this zero-egress environment
  * cannot host (a deployment re-runs [[TopicContract]] against the real
  * broker; see the trait scaladoc).
  */
class ConnectorTopicSpec extends AnyFunSuite with SparkTestSession {

  private val pulsar = ConnectorTopic.Pulsar(
    "pulsar://broker:6650", "http://broker:8080")
  private val kafka = ConnectorTopic.Kafka("broker:9092")

  test("read options translate per the SURVEY §8 S1-seam table") {
    assert(ConnectorTopic.readOptions(pulsar, "jobs", 16) == Map(
      "topics" -> "jobs",
      "service.url" -> "pulsar://broker:6650",
      "admin.url" -> "http://broker:8080",
      "maxEntriesPerTrigger" -> "16",
      "startingOffsets" -> "earliest"))
    assert(ConnectorTopic.readOptions(kafka, "jobs", 16) == Map(
      "subscribe" -> "jobs",
      "kafka.bootstrap.servers" -> "broker:9092",
      "maxOffsetsPerTrigger" -> "16",
      "startingOffsets" -> "earliest"))
  }

  test("batch-read and write options carry the endpoint + full-range bounds") {
    assert(ConnectorTopic.batchReadOptions(kafka, "jobs")
      .get("endingOffsets").contains("latest"))
    assert(ConnectorTopic.batchReadOptions(pulsar, "jobs")
      .get("startingOffsets").contains("earliest"))
    assert(ConnectorTopic.writeOptions(pulsar, "jobs") == Map(
      "topic" -> "jobs",
      "service.url" -> "pulsar://broker:6650",
      "admin.url" -> "http://broker:8080"))
    assert(ConnectorTopic.writeOptions(kafka, "jobs") == Map(
      "topic" -> "jobs",
      "kafka.bootstrap.servers" -> "broker:9092"))
  }

  test("JSON wire envelope round-trips bit-exactly (encode → decode)") {
    import spark.implicits._
    val topic = ConnectorTopic.create(spark, "wire", kafka,
      Payloads.payloadSchema, keyColumn = Some("name"))
    val in = Seq(("ada", 3), ("bob", 0)).toDF("name", "numPublishes")
    val records = topic.encodeRecords(in)
    assert(records.columns.toSeq == Seq("key", "value"),
      "keyed topics must emit (key, value) records")
    val out = topic.decodeRecords(records)
      .select("name", "numPublishes", "topic", "deliveries", "not_before")
      .as[(String, Int, String, Int, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("ada", 3, "wire", 0, 0L), ("bob", 0, "wire", 0, 0L)),
      s"wire round-trip drifted: $out")
    // redelivery metadata survives the wire (the RepublishPipeline nack path)
    val redelivered = Seq(("cat", 1, 2, 9999L))
      .toDF("name", "numPublishes", "deliveries", "not_before")
    val rt = topic.decodeRecords(topic.encodeRecords(redelivered))
      .select("name", "deliveries", "not_before")
      .as[(String, Int, Long)].collect().toSeq
    assert(rt == Seq(("cat", 2, 9999L)))
    // unkeyed topics emit value-only records
    val unkeyed = ConnectorTopic.create(spark, "wire2", kafka,
      Payloads.payloadSchema)
    assert(unkeyed.encodeRecords(in).columns.toSeq == Seq("value"))
  }
}
