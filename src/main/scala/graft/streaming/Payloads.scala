package graft.streaming

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Payload model for the streaming surface.
  *
  * The reference's payloads are flat case classes JSON-encoded on the wire
  * (reference util/PulsarClientSetup.scala:14-31,
  * part5/OrderedMessageProcessor.scala:23-44). Here the same shapes are
  * Spark rows: a case class + product encoder for the typed API, and
  * to_json/from_json over the declared schema for the wire format — no
  * hand-rolled codec.
  */
object Payloads {

  /** `TestPayload` analog: name + republish hop count
    * (reference util/PulsarClientSetup.scala:14-19).
    */
  final case class Payload(name: String, numPublishes: Int)

  /** `TestPayloadOrdered` analog: adds the ordering key
    * (reference part5/OrderedMessageProcessor.scala:23-31).
    */
  final case class KeyedPayload(name: String, key: String, numPublishes: Int)

  /** The republish increment — the one "column computation" in the
    * reference's core loop (reference util/PulsarClientSetup.scala:17).
    */
  def republishHop(numPublishes: Column): Column = numPublishes + 1

  val payloadSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("numPublishes", IntegerType, nullable = false)))

  val keyedPayloadSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("numPublishes", IntegerType, nullable = false)))

  implicit val payloadEncoder: Encoder[Payload] = Encoders.product[Payload]
  implicit val keyedPayloadEncoder: Encoder[KeyedPayload] = Encoders.product[KeyedPayload]

  /** JSON wire encode (reference F1: `Json.writes` —
    * util/PulsarClientSetup.scala:22).
    */
  def encodeJson(name: Column, numPublishes: Column): Column =
    to_json(struct(name.as("name"), numPublishes.as("numPublishes")))

  /** JSON wire decode, FAILFAST like the reference's `.as[T]` (reference
    * F2: util/PulsarClientSetup.scala:26 throws on mismatch).
    */
  def decodeJson(value: Column): Column =
    from_json(value, payloadSchema, Map("mode" -> "FAILFAST"))

  /** Topic normalization (reference F4:
    * `getTopicName.stripSuffix("-partition-0")`,
    * part3/LimitedMessageProcessor.scala:75).
    */
  def normalizeTopic(topic: Column): Column =
    regexp_replace(topic, "-partition-0$", "")
}
