package graft.streaming.broker

import graft.streaming.Topic
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** [[Topic]] over the embedded broker, read through the DataSource-V2
  * [[BrokerMicroBatchStream]] — same envelope columns as [[
  * graft.streaming.FileTopic]] (payload + `topic` + `deliveries`), so
  * every pipeline runs unmodified on either.
  *
  * The producer side appends through the driver (`collect` → broker
  * append), which is the embedded-broker analog of the reference's
  * driver-created producers (util/PulsarClientWrapper.scala:151-165); a
  * cluster deployment swaps this method body for per-partition producer
  * clients, leaving the read path — the part with engine-visible
  * semantics — untouched.
  */
final class BrokerTopic(val spark: SparkSession, val name: String,
    schema: StructType) extends Topic {

  private val envelopeSchema: StructType = schema
    .add("topic", "string").add("deliveries", "int").add("not_before", "long")

  InMemoryBroker.createTopic(name, envelopeSchema)

  override def publish(rows: DataFrame): Unit = {
    val out = envelope(rows).collect()
    if (out.nonEmpty) InMemoryBroker.topic(name).append(out.toSeq)
  }

  override def publishNonEmpty(rows: DataFrame): Unit =
    InMemoryBroker.topic(name).append(envelope(rows).collect().toSeq)

  override def publishSeed(rows: DataFrame): Unit =
    publish(rows.withColumn("deliveries", lit(0)))

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
      .select(envelopeSchema.fieldNames.map(col).toSeq: _*)

  override def readStream(admitPerTrigger: Int = 16): DataFrame =
    spark.readStream.format("graft-broker")
      .option("topic", name)
      .option("maxRowsPerTrigger", admitPerTrigger.toLong)
      .load()

  override def readAll(): DataFrame =
    spark.read.format("graft-broker").option("topic", name).load()
}

object BrokerTopic {
  def create(spark: SparkSession, name: String, schema: StructType): BrokerTopic =
    new BrokerTopic(spark, name, schema)
}
