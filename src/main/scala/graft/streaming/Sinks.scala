package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Sink constructors mapping the reference's sink inventory (SURVEY §2A
  * K1-K5).
  *
  *  - **K1/K2 drain** (`Sink.ignore` / ZIO `runDrain`): the noop sink —
  *    runs the stream for its effects/metrics, discards rows.
  *  - **K3 fold** (`Sink.fold` collecting the ShutdownHook set,
  *    part3/MultipleWorkloadsExample.scala:213): on bounded data a plain
  *    `Dataset.reduce`; for the control-plane use the reference folded it
  *    for, [[WorkloadManager]] keeps the name→query registry instead.
  *  - **K4 keyed republish** ([[FileTopic.publish]] /
  *    [[RepublishPipeline]]): payload + key appended to a topic; with the
  *    Pulsar connector this is
  *    `select(to_json(...).as("value"), col("key")).writeStream
  *    .format("pulsar")`.
  *  - **K5 asPublisher**: reactive-streams interop — n/a, one engine end
  *    to end (SURVEY T12).
  *
  * F5 producer routing (`producers(topicName)` map lookup,
  * part3/LimitedMessageProcessor.scala:77) becomes [[partitionedByTopic]]:
  * one partitioned write fans rows out to per-topic directories — the
  * declarative form of a producer-per-topic map.
  */
object Sinks {

  /** K1/K2: drain the stream (checkpoint-acked, rows discarded). */
  def drain(df: DataFrame, queryName: String, checkpointDir: String)
      : StreamingQuery =
    df.writeStream.format("noop").queryName(queryName)
      .option("checkpointLocation", checkpointDir).start()

  /** K3: fold a bounded control dataset into one value. */
  def fold[T](ds: Dataset[T])(op: (T, T) => T): T = ds.reduce(op)

  /** F5/K4 batch form: route each row to its topic's directory in a
    * single partitioned write (no driver-side producer map, no per-topic
    * loop — the write itself is the router).
    */
  def partitionedByTopic(df: DataFrame, baseDir: String): Unit =
    df.withColumn("topic", Payloads.normalizeTopic(col("topic")))
      .write.mode("append").partitionBy("topic").parquet(baseDir)
}
