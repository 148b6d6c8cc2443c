package graft.streaming

import graft.SparkTestSession
import graft.functions.PolyHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end process→republish→ack loop on a file topic (reference part 2
  * feedback loop made bounded/testable). Asserts the at-least-once
  * invariant: with deterministic failure injection, every (seed, hop)
  * combination is processed — failed deliveries are redelivered, nothing
  * is lost — and hops increment exactly once per republish.
  */
class RepublishPipelineSpec extends AnyFunSuite with SparkTestSession {

  test("no message lost under injected failures; hops increment once per republish") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-topic-").toString
    val topic = FileTopic.create(spark, "cats", base, Payloads.payloadSchema)
    val dlq = FileTopic.create(spark, "cats-dlq", base, Payloads.payloadSchema)
    val cfg = RepublishPipeline.Config(
      failPercent = 40, maxHops = 3, maxDeliveries = 3, maxFilesPerTrigger = 8)

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
      topic, dlq, s"$base/ckpt", "republish-cats", cfg)
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

  test("ack = checkpoint commit: restart resumes without reprocessing (T2)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val topic = FileTopic.create(spark, "dogs", base, Payloads.payloadSchema)
    val dlq = FileTopic.create(spark, "dogs-dlq", base, Payloads.payloadSchema)
    val cfg = RepublishPipeline.Config(
      failPercent = 0, maxHops = 2, maxDeliveries = 3, maxFilesPerTrigger = 8)

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
    val q1 = RepublishPipeline.start(topic, dlq, s"$base/ckpt", "republish-dogs", cfg)
    try drain(q1) finally q1.stop()
    assert(hops() == Seq(("akita", 0), ("akita", 1)))

    // phase 2: new traffic lands while the pipeline is DOWN; restart from
    // the same checkpoint must process only the new message — a replay of
    // akita would re-publish its hop-1 and show up as a duplicate
    topic.publishSeed(Seq(("beagle", 0)).toDF("name", "numPublishes"))
    val q2 = RepublishPipeline.start(topic, dlq, s"$base/ckpt", "republish-dogs", cfg)
    try drain(q2) finally q2.stop()
    assert(hops() == Seq(("akita", 0), ("akita", 1), ("beagle", 0), ("beagle", 1)),
      "restart must resume exactly where the checkpoint committed")
  }
}
