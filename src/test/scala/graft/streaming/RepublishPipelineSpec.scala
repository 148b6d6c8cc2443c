package graft.streaming

import graft.SparkTestSession
import graft.functions.PolyHash
import graft.streaming.broker.BrokerTopic
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end process→republish→ack loop (reference part 2 feedback loop
  * made bounded/testable), run UNMODIFIED against both [[Topic]]
  * implementations: the parquet [[FileTopic]] harness and the
  * DataSource-V2 embedded-broker source. Asserts the at-least-once
  * invariant: with deterministic failure injection, every (seed, hop)
  * combination is processed — failed deliveries are redelivered, nothing
  * is lost — and hops increment exactly once per republish.
  */
class RepublishPipelineSpec extends AnyFunSuite with SparkTestSession {

  private def mkTopic(kind: String, name: String, base: String): Topic =
    kind match {
      case "file" => FileTopic.create(spark, name, base, Payloads.payloadSchema)
      case "broker" =>
        BrokerTopic.create(spark, s"$name-${System.nanoTime()}", Payloads.payloadSchema)
      case "broker-durable" =>
        // persisted log: the pipeline's concurrent executor-side appends
        // (feedback republish + redelivery) all flow through the
        // per-partition file mirror
        BrokerTopic.create(spark, s"$name-${System.nanoTime()}",
          Payloads.payloadSchema,
          logDir = Some(java.nio.file.Files
            .createTempDirectory("graft-durable-log-").toString))
    }

  for (kind <- Seq("file", "broker", "broker-durable")) {

    test(s"[$kind] no message lost under injected failures; hops increment once per republish") {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-topic-").toString
      val topic = mkTopic(kind, "cats", base)
      val dlq = mkTopic(kind, "cats-dlq", base)
      val cfg = RepublishPipeline.Config(
        failPercent = 40, maxHops = 3, maxDeliveries = 3, admitPerTrigger = 8)

      val seeds = Seq("lion", "tiger", "panther")
      // at failPercent=40 at least one (seed, hop) must fail first delivery;
      // verify the fixture actually exercises the retry path
      val failing = for {
        n <- seeds; h <- 0 until cfg.maxHops
        if PolyHash.hash(s"$n#$h") % 100 < cfg.failPercent
      } yield (n, h)
      assert(failing.nonEmpty, "fixture must include at least one injected failure")

      topic.publishSeed(seeds.map(n => (n, 0)).toDF("name", "numPublishes"))
      val query = RepublishPipeline.start(
        topic, dlq, s"$base/ckpt", s"republish-cats-$kind", cfg)
      try {
        // drain the feedback loop: keep processing until the topic stabilizes
        var prev = -1L
        var stable = 0
        while (stable < 2) {
          query.processAllAvailable()
          val cnt = topic.readAll().count()
          if (cnt == prev) stable += 1 else { stable = 0; prev = cnt }
        }
        val rows = topic.readAll()
          .select("name", "numPublishes", "deliveries")
          .as[(String, Int, Int)].collect().toSeq

        // every seed reached every hop < maxHops (no loss, exact increment)
        val hops = rows.map(r => (r._1, r._2)).toSet
        for (n <- seeds; h <- 0 until cfg.maxHops)
          assert(hops.contains((n, h)), s"missing ($n, hop $h): $hops")
        // nothing beyond the bound
        assert(rows.forall(_._2 < cfg.maxHops))
        // each injected failure produced a redelivery (deliveries = 1)
        for ((n, h) <- failing)
          assert(rows.contains((n, h, 1)), s"missing redelivery of ($n, hop $h)")
        // non-failing (seed, hop)s were never redelivered
        val redelivered = rows.filter(_._3 > 0).map(r => (r._1, r._2)).toSet
        assert(redelivered == failing.toSet)
        // nothing dead-lettered (all failures succeed on redelivery)
        assert(dlq.readAll().count() == 0)
      } finally query.stop()
    }

    test(s"[$kind] ack = checkpoint commit: restart resumes without reprocessing (T2)") {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
      val topic = mkTopic(kind, "dogs", base)
      val dlq = mkTopic(kind, "dogs-dlq", base)
      val cfg = RepublishPipeline.Config(
        failPercent = 0, maxHops = 2, maxDeliveries = 3, admitPerTrigger = 8)

      def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
        var prev = -1L; var stable = 0
        while (stable < 2) {
          q.processAllAvailable()
          val cnt = topic.readAll().count()
          if (cnt == prev) stable += 1 else { stable = 0; prev = cnt }
        }
      }
      def hops() = topic.readAll().select("name", "numPublishes")
        .as[(String, Int)].collect().toSeq.sorted

      // phase 1: process seed A fully, then STOP (graceful: checkpoint holds
      // the committed offset = the broker ack)
      topic.publishSeed(Seq(("akita", 0)).toDF("name", "numPublishes"))
      val q1 = RepublishPipeline.start(topic, dlq, s"$base/ckpt", s"republish-dogs-$kind", cfg)
      try drain(q1) finally q1.stop()
      assert(hops() == Seq(("akita", 0), ("akita", 1)))

      // phase 2: new traffic lands while the pipeline is DOWN; restart from
      // the same checkpoint must process only the new message — a replay of
      // akita would re-publish its hop-1 and show up as a duplicate
      topic.publishSeed(Seq(("beagle", 0)).toDF("name", "numPublishes"))
      val q2 = RepublishPipeline.start(topic, dlq, s"$base/ckpt", s"republish-dogs-$kind", cfg)
      try drain(q2) finally q2.stop()
      assert(hops() == Seq(("akita", 0), ("akita", 1), ("beagle", 0), ("beagle", 1)),
        "restart must resume exactly where the checkpoint committed")
    }
  }

  test("nacked rows honor the redelivery backoff (broker delayed delivery)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-backoff-").toString
    val topic = mkTopic("file", "owls", base)
    val dlq = mkTopic("file", "owls-dlq", base)
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
