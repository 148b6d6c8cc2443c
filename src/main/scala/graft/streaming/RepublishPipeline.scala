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
  *    `:70-88`) ≡ failed rows are re-published to the source topic with
  *    `deliveries + 1` — same at-least-once contract, bounded by
  *    `maxDeliveries` into a dead-letter topic;
  *  - **redelivery delay** (reference `negativeAckRedeliveryDelay` = 10 s,
  *    util/PulsarClientWrapper.scala:171) ≡ `redeliveryBackoffMs`: a
  *    nacked row carries `not_before = now + backoff` and is re-enqueued
  *    untouched (no processing, no delivery increment) by any trigger
  *    that admits it early — the broker-side delayed-delivery pattern
  *    expressed through the topic's `not_before` metadata;
  *  - **republish with numPublishes + 1** (reference K4,
  *    part2/MessageProcessor.scala:65-68) ≡ success rows appended back to
  *    the topic with the hop counter incremented, bounded by `maxHops`
  *    (the reference's feedback loop runs unbounded; a bound makes it
  *    testable — SURVEY §7.4 hard part #3);
  *  - **bounded intake** (reference C3) ≡ `admitPerTrigger` on the source
  *    (files for [[FileTopic]], rows for the DSv2 broker source), so one
  *    trigger never admits unbounded work.
  *
  * The pipeline is written against [[Topic]] — it runs identically on the
  * parquet test harness and on the DataSource-V2 embedded-broker source.
  */
object RepublishPipeline {

  final case class Config(
      failPercent: Int = 10,
      maxHops: Int = 3,
      maxDeliveries: Int = 3,
      admitPerTrigger: Int = 16,
      redeliveryBackoffMs: Long = 0)

  /** Wire the pipeline on a topic and start it (reference T5: stream
    * construction returning its handle). The returned query is the
    * ShutdownHook analog: `stop()` = graceful drain (C1/C2),
    * checkpointing = resumability.
    */
  def start(topic: Topic, deadLetter: Topic, checkpointDir: String,
      queryName: String, cfg: Config = Config()): StreamingQuery = {

    val payloadCols = Seq("name", "numPublishes")
    val envelopeCols = payloadCols ++ Seq("deliveries", "not_before")

    topic.readStream(cfg.admitPerTrigger)
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val now = System.currentTimeMillis()
        val processed = ProcessStage.withProcessing(batch, cfg.failPercent)
          .withColumn("due", coalesce(col("not_before"), lit(0L)) <= lit(now))
          // foreachBatch re-evaluates its input per action below; persist so
          // the (deterministic) processing runs once per message per batch
          .persist()
        try {
          // the output slices of one batch — each slice matches its status
          // EXPLICITLY (never `!success`): a third status value or a NULL
          // must surface as an unrouted row in the invariant below, not
          // silently flow to the nack/dead-letter path
          val isSuccess = col("due") && col("status") === ProcessStage.Success
          val isFailure = col("due") && col("status") === ProcessStage.Failure
          val republishable = isSuccess &&
            Payloads.republishHop(col("numPublishes")) < cfg.maxHops
          val redeliverable = isFailure &&
            (col("deliveries") + 1) < cfg.maxDeliveries
          val dead = isFailure && (col("deliveries") + 1) >= cfg.maxDeliveries
          // a not-yet-due row is re-enqueued untouched: admitted early by
          // this trigger, deliverable only after its not_before
          val deferred = !col("due")
          // ONE counting action over the persisted batch (instead of one
          // emptiness job per publish — 4 extra jobs per trigger)
          val counts = processed.select(
            sum(republishable.cast("long")), sum(redeliverable.cast("long")),
            sum(dead.cast("long")), sum(deferred.cast("long")),
            sum(coalesce(col("due") && !isSuccess && !isFailure, lit(true))
              .cast("long")),
            count(lit(1))).head()
          def cnt(i: Int): Long = if (counts.isNullAt(i)) 0L else counts.getLong(i)
          // status-domain assertion: every due row is success or failure
          require(cnt(4) == 0L,
            s"ProcessStage emitted ${cnt(4)} of ${cnt(5)} rows with " +
              "a status outside {success, failure}; refusing to route them")
          // K4: successful messages republished with the hop increment,
          // feedback bounded by maxHops
          if (cnt(0) > 0) topic.publishNonEmpty(
            processed.filter(republishable)
              .withColumn("numPublishes", Payloads.republishHop(col("numPublishes")))
              .withColumn("deliveries", lit(0))
              .withColumn("not_before", lit(0L))
              .select(envelopeCols.map(col): _*))
          // T2 nack path: failed messages redelivered with deliveries+1 no
          // earlier than now + backoff, dead-lettered past maxDeliveries
          if (cnt(1) > 0) topic.publishNonEmpty(
            processed.filter(redeliverable)
              .withColumn("deliveries", col("deliveries") + 1)
              .withColumn("not_before",
                if (cfg.redeliveryBackoffMs > 0) lit(now + cfg.redeliveryBackoffMs)
                else lit(0L))
              .select(envelopeCols.map(col): _*))
          if (cnt(2) > 0) deadLetter.publishNonEmpty(
            processed.filter(dead)
              .withColumn("deliveries", col("deliveries") + 1)
              .withColumn("not_before", lit(0L))
              .select(envelopeCols.map(col): _*))
          if (cnt(3) > 0) topic.publishNonEmpty(
            processed.filter(deferred).select(envelopeCols.map(col): _*))
        } finally processed.unpersist()
      }
      .start()
  }
}
