package graft.streaming

import graft.SparkTestSession
import graft.streaming.broker.BrokerTopic
import org.scalatest.funsuite.AnyFunSuite

/** Executable form of the reference's bounded-intake behavior (C3:
  * `Attributes.inputBuffer(0,1)` + permit limits — more offered work than
  * permitted must wait at the source, not flood the stream), run against
  * both [[Topic]] implementations:
  *  - [[FileTopic]]: `maxFilesPerTrigger = 1` with one row per file;
  *  - DSv2 broker source: `ReadLimit.maxRows(1)` admission control — the
  *    bound holds even when the backlog was queued as ONE append, because
  *    rows (not files) are the admission unit.
  */
class BoundedIntakeSpec extends AnyFunSuite with SparkTestSession {

  for (kind <- Seq("file", "broker")) {
    test(s"[$kind] rows per trigger never exceed the configured admission bound") {
      import spark.implicits._
      val topic: Topic = kind match {
        case "file" =>
          val base = java.nio.file.Files.createTempDirectory("graft-intake-").toString
          val t = FileTopic.create(spark, "bounded", base, Payloads.payloadSchema)
          // 6 separate publishes -> 6 files, one row each, all queued up front
          (0 until 6).foreach(i =>
            t.publishSeed(Seq((s"m$i", 0)).toDF("name", "numPublishes")))
          t
        case "broker" =>
          val t = BrokerTopic.create(
            spark, s"bounded-${System.nanoTime()}", Payloads.payloadSchema)
          // ONE append of 6 rows: admission must still be 1 row per trigger
          t.publishSeed((0 until 6).map(i => (s"m$i", 0)).toDF("name", "numPublishes"))
          t
      }

      val gauges = new Gauges
      spark.streams.addListener(gauges)
      val name = s"bounded_${kind}_${System.nanoTime()}"
      val query = topic.readStream(admitPerTrigger = 1)
        .writeStream.format("memory").queryName(name).start()
      try {
        query.processAllAvailable()
        assert(spark.table(name).count() == 6, "all queued messages drained")
        val snap = gauges.snapshot(name).get
        assert(snap.maxBatchRows <= 1,
          s"a trigger admitted ${snap.maxBatchRows} rows, bound is 1")
        assert(snap.batches >= 6, "the backlog required at least 6 triggers")
      } finally {
        query.stop()
        spark.streams.removeListener(gauges)
      }
    }
  }
}
