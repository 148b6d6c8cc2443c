package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline behaviors ABOVE the [[Topic]] contract (the
  * process→republish→ack loop itself now lives in [[TopicContract]],
  * run against every Topic implementation): the redelivery backoff —
  * the broker delayed-delivery semantics RepublishPipeline stamps into
  * `not_before`.
  */
class RepublishPipelineSpec extends AnyFunSuite with SparkTestSession {

  test("nacked rows honor the redelivery backoff (broker delayed delivery)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-backoff-").toString
    val topic = FileTopic.create(spark, "owls", base, Payloads.payloadSchema)
    val dlq = FileTopic.create(spark, "owls-dlq", base, Payloads.payloadSchema)
    val backoffMs = 600L
    val cfg = RepublishPipeline.Config(
      failPercent = 100, maxHops = 1, maxDeliveries = 2, admitPerTrigger = 8,
      redeliveryBackoffMs = backoffMs)

    // failPercent=100 fails every FIRST delivery; the retry succeeds. With
    // maxHops=1 the success is not republished, so the topic ends with the
    // seed + exactly one redelivery row — whose not_before must be at
    // least backoff after the seed's processing.
    topic.publishSeed(Seq(("tawny", 0)).toDF("name", "numPublishes"))
    val t0 = System.currentTimeMillis()
    val query = RepublishPipeline.start(
      topic, dlq, s"$base/ckpt", "republish-owls", cfg)
    try {
      var prev = -1L; var stable = 0
      while (stable < 2) {
        query.processAllAvailable()
        val rows = topic.readAll()
          .select("deliveries", "not_before").as[(Int, Long)].collect()
        // invariant at every observation point: nothing is PROCESSED before
        // its not_before — a second delivery (deliveries=1) succeeding
        // before its due time would have been visible as hop-1 republish or
        // dlq traffic; here we assert the redelivery row itself carries the
        // backoff stamp
        rows.filter(_._1 == 1).foreach { case (_, nb) =>
          assert(nb >= t0 + backoffMs, s"redelivery stamped not_before=$nb, " +
            s"expected >= ${t0 + backoffMs}")
        }
        val cnt = rows.length.toLong
        if (cnt == prev) stable += 1 else { stable = 0; prev = cnt }
      }
      // the retry eventually ran (deliveries=1 row exists) and only after
      // its due time: the pipeline records success by NOT dead-lettering
      val finalRows = topic.readAll()
        .select("deliveries", "not_before").as[(Int, Long)].collect()
      assert(finalRows.exists(_._1 == 1), "redelivery must eventually happen")
      assert(dlq.readAll().count() == 0,
        "retry succeeded after backoff; nothing dead-letters")
      assert(System.currentTimeMillis() >= t0 + backoffMs,
        "pipeline cannot have settled before the backoff elapsed")
    } finally query.stop()
  }
}
