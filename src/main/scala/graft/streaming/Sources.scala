package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Source constructors mapping the reference's source inventory (SURVEY
  * §2A S1-S4) onto Spark sources.
  *
  *  - **S1 broker source** (PulsarPekkoSource,
  *    part1/PulsarPekkoSource.scala:116-131): in production
  *    `spark.readStream.format("pulsar")` via the StreamNative connector
  *    (or any DataSource-V2 streaming source); in this repo [[FileTopic]]
  *    is the drop-in file-backed stand-in with the same envelope columns.
  *    The graph stage's demand-driven pull (`onPull → receiveAsync`) is
  *    subsumed by micro-batch admission: `maxOffsetsPerTrigger` /
  *    `maxFilesPerTrigger` bound what one trigger pulls, and the broker —
  *    not the engine — buffers the rest (reference C3's
  *    `Attributes.inputBuffer(0,1)` intent).
  *  - **S2 bounded queue** (`Source.queue`,
  *    part3/PermittedTaskExecutor.scala:80-81): `MemoryStream` for tests
  *    and driver-side control flows ([[queue]]).
  *  - **S3 tick** (`Source.tick`,
  *    part4/WorkloadManagementService.scala:165-166): the rate source
  *    ([[tick]]) for data-plane ticks; `Trigger.ProcessingTime` /
  *    a scheduled executor for control-plane polling (see
  *    [[WorkloadManager.startPolling]]).
  *  - **S4 collection** (`Source(List(...))`,
  *    part3/MultipleWorkloadsExample.scala:206-212): [[collection]].
  */
object Sources {

  /** S2: in-memory backpressured queue; `addData` is the `offer()`. */
  def queue[T: Encoder](spark: SparkSession)
      : org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T] = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T]
  }

  /** S3: periodic element emission, `ticksPerSecond` rows/s with
    * `timestamp` and monotonically increasing `value` columns.
    */
  def tick(spark: SparkSession, ticksPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", ticksPerSecond.toLong).load()

  /** S4: finite collection source. */
  def collection[T: Encoder](spark: SparkSession, xs: Seq[T]): Dataset[T] =
    spark.createDataset(xs)
}
