package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The core process→republish→ack pipeline (reference part 2:
  * PekkoStreamGenerator.createStreamFromSourceAndProcessingSteps,
  * part2/PekkoStreamGenerator.scala:30-96).
  *
  * Semantics mapping:
  *  - **ack** (reference T2 `acknowledgeAsync`, `:57-69`) ≡ micro-batch
  *    checkpoint commit: a batch whose `foreachBatch` body returns is
  *    acked exactly once by the checkpoint — the ack-with-one-retry dance
  *    disappears because commit is transactional per batch;
  *  - **nack → broker redelivery** (reference `negativeAcknowledge`,
  *    `:70-88`, 10 s redelivery) ≡ failed rows are re-published to the
  *    source topic with `deliveries + 1` — same at-least-once contract,
  *    bounded by `maxDeliveries` into a dead-letter topic;
  *  - **republish with numPublishes + 1** (reference K4,
  *    part2/MessageProcessor.scala:65-68) ≡ success rows appended back to
  *    the topic with the hop counter incremented, bounded by `maxHops`
  *    (the reference's feedback loop runs unbounded; a bound makes it
  *    testable — SURVEY §7.4 hard part #3);
  *  - **bounded intake** (reference C3) ≡ `maxFilesPerTrigger` on the
  *    source, so one trigger never admits unbounded work.
  */
object RepublishPipeline {

  final case class Config(
      failPercent: Int = 10,
      maxHops: Int = 3,
      maxDeliveries: Int = 3,
      maxFilesPerTrigger: Int = 16)

  /** Wire the pipeline on a topic and start it (reference T5: stream
    * construction returning its handle). The returned query is the
    * ShutdownHook analog: `stop()` = graceful drain (C1/C2),
    * checkpointing = resumability.
    */
  def start(topic: FileTopic, deadLetter: FileTopic, checkpointDir: String,
      queryName: String, cfg: Config = Config()): StreamingQuery = {

    val payloadCols = Seq("name", "numPublishes")

    topic.readStream(cfg.maxFilesPerTrigger)
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val processed = ProcessStage.withProcessing(batch, cfg.failPercent)
          // foreachBatch re-evaluates its input per action below; persist so
          // the (deterministic) processing runs once per message per batch
          .persist()
        try {
          // the three output slices of one batch
          val isSuccess = col("status") === ProcessStage.Success
          val republishable = isSuccess &&
            Payloads.republishHop(col("numPublishes")) < cfg.maxHops
          val redeliverable = !isSuccess &&
            (col("deliveries") + 1) < cfg.maxDeliveries
          val dead = !isSuccess && (col("deliveries") + 1) >= cfg.maxDeliveries
          // ONE counting action over the persisted batch (instead of one
          // emptiness job per publish — 3 extra jobs per trigger)
          val counts = processed.select(
            sum(republishable.cast("long")), sum(redeliverable.cast("long")),
            sum(dead.cast("long"))).head()
          def cnt(i: Int): Long = if (counts.isNullAt(i)) 0L else counts.getLong(i)
          // K4: successful messages republished with the hop increment,
          // feedback bounded by maxHops
          if (cnt(0) > 0) topic.publishNonEmpty(
            processed.filter(republishable)
              .withColumn("numPublishes", Payloads.republishHop(col("numPublishes")))
              .withColumn("deliveries", lit(0))
              .select((payloadCols :+ "deliveries").map(col): _*))
          // T2 nack path: failed messages redelivered with deliveries+1,
          // dead-lettered past maxDeliveries
          if (cnt(1) > 0) topic.publishNonEmpty(
            processed.filter(redeliverable)
              .withColumn("deliveries", col("deliveries") + 1)
              .select((payloadCols :+ "deliveries").map(col): _*))
          if (cnt(2) > 0) deadLetter.publishNonEmpty(
            processed.filter(dead)
              .withColumn("deliveries", col("deliveries") + 1)
              .select((payloadCols :+ "deliveries").map(col): _*))
        } finally processed.unpersist()
      }
      .start()
  }
}
