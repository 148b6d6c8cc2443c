package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A file-backed "topic": an append-only parquet directory read as a
  * stream. This is the test/local stand-in for the broker source (reference
  * S1, part1/PulsarPekkoSource.scala) — in production the same pipeline
  * reads `spark.readStream.format("pulsar")` (StreamNative connector) or
  * any DataSource-V2 streaming source; everything downstream is identical.
  *
  * Envelope columns follow the connector's shape: payload columns plus
  * `topic`, `deliveries` (the redelivery counter that replaces broker
  * `deliveryCount`) and `not_before` (earliest deliverable epoch-ms — the
  * broker's delayed-delivery / `deliverAfter` metadata, 0 = immediately).
  */
final class FileTopic(val spark: SparkSession, val name: String, val dir: String,
    schema: StructType) extends Topic {

  private val envelopeSchema: StructType = schema
    .add("topic", "string").add("deliveries", "int").add("not_before", "long")

  /** Producer send (reference K4). Batching intentionally not tunable:
    * each call is one atomic append, like the examples' batching-off
    * producers (part2/SingleWorkloadExample.scala:85).
    */
  override def publish(rows: DataFrame): Unit = {
    // an empty append still creates a parquet file, which a streaming
    // reader of this topic would see as a new file — feeding an infinite
    // empty-batch loop on feedback topologies. Never write empty sends.
    // (Callers that already know the send is non-empty — e.g. a pipeline
    // that counted its batch slices in one pass — use publishNonEmpty and
    // skip this extra Spark action.)
    val out = envelope(rows)
    if (!out.isEmpty) out.write.mode(SaveMode.Append).parquet(dir)
  }

  /** [[publish]] minus the emptiness action, for callers that have
    * already established `rows` is non-empty (one counting pass over a
    * persisted batch instead of one action per publish).
    */
  override def publishNonEmpty(rows: DataFrame): Unit =
    envelope(rows).write.mode(SaveMode.Append).parquet(dir)

  private def envelope(rows: DataFrame): DataFrame =
    rows
      .withColumn("topic", lit(name))
      .withColumn("deliveries",
        if (rows.columns.contains("deliveries"))
          coalesce(col("deliveries"), lit(0))
        else lit(0))
      .withColumn("not_before",
        if (rows.columns.contains("not_before"))
          coalesce(col("not_before"), lit(0L))
        else lit(0L))
      .select(envelopeSchema.fieldNames.map(col): _*)

  override def publishSeed(rows: DataFrame): Unit =
    publish(rows.withColumn("deliveries", lit(0)))

  /** Streaming scan with bounded intake (reference C3: inputBuffer(0,1) +
    * receiverQueueSize — the broker buffers, the app admits a bounded
    * amount per trigger; here `maxFilesPerTrigger`).
    */
  override def readStream(admitPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(envelopeSchema)
      .option("maxFilesPerTrigger", admitPerTrigger)
      .parquet(dir)

  /** Batch read of everything currently on the topic. */
  override def readAll(): DataFrame = spark.read.schema(envelopeSchema).parquet(dir)
}

object FileTopic {
  def create(spark: SparkSession, name: String, baseDir: String,
      schema: StructType): FileTopic = {
    val dir = s"$baseDir/$name"
    new java.io.File(dir).mkdirs()
    new FileTopic(spark, name, dir, schema)
  }
}
