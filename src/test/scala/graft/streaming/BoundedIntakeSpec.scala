package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executable form of the reference's bounded-intake behavior (C3:
  * `Attributes.inputBuffer(0,1)` + permit limits — more offered work than
  * permitted must wait at the source, not flood the stream). Here:
  * `maxFilesPerTrigger = 1` with one row per file ⇒ no micro-batch may
  * ever contain more than one row, however much is queued on the topic.
  */
class BoundedIntakeSpec extends AnyFunSuite with SparkTestSession {

  test("rows per trigger never exceed the configured admission bound") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-intake-").toString
    val topic = FileTopic.create(spark, "bounded", base, Payloads.payloadSchema)
    // 6 separate publishes -> 6 files, one row each, all queued up front
    (0 until 6).foreach(i =>
      topic.publishSeed(Seq((s"m$i", 0)).toDF("name", "numPublishes")))

    val gauges = new Gauges
    spark.streams.addListener(gauges)
    val name = s"bounded_${System.nanoTime()}"
    val query = topic.readStream(maxFilesPerTrigger = 1)
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
