package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkTestSession
import graft.streaming.broker.{BrokerOffsets, BrokerTopic, InMemoryBroker}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The DataSource-V2 broker source (S1 —
  * reference part1/PulsarPekkoSource.scala:44-131): offset protocol,
  * admission control, and checkpoint-resume through the source's own
  * offsets — the connector semantics the file-topic stand-in could only
  * document.
  */
class BrokerSourceSpec extends AnyFunSuite with SparkTestSession {

  private def freshTopic(prefix: String): BrokerTopic =
    BrokerTopic.create(spark, s"$prefix-${System.nanoTime()}", Payloads.payloadSchema)

  test("offset json round-trips (checkpoint serialization)") {
    val o = BrokerOffsets(Map(0 -> 42L, 1 -> 7L, 3 -> 0L))
    assert(BrokerOffsets.fromJson(o.json) == o)
    // sorted-key serialization is deterministic (checkpoint stability)
    assert(o.json == """{"0":42,"1":7,"3":0}""")
    assert(BrokerOffsets.fromJson("{}") == BrokerOffsets(Map.empty))
  }

  test("micro-batch scan drains the backlog in admission-bounded slices") {
    import spark.implicits._
    val topic = freshTopic("drain")
    topic.publishSeed((0 until 5).map(i => (s"m$i", 0)).toDF("name", "numPublishes"))

    val gauges = new Gauges
    spark.streams.addListener(gauges)
    val name = s"drain_${System.nanoTime()}"
    val query = topic.readStream(admitPerTrigger = 2)
      .writeStream.format("memory").queryName(name).start()
    try {
      query.processAllAvailable()
      assert(spark.table(name).count() == 5)
      val snap = gauges.snapshot(name).get
      assert(snap.maxBatchRows <= 2, s"admitted ${snap.maxBatchRows} > bound 2")
      assert(snap.batches >= 3, "5 rows at ≤2/trigger need ≥3 triggers")
    } finally {
      query.stop()
      spark.streams.removeListener(gauges)
    }
  }

  test("restart resumes from the committed offset, not the log head") {
    import spark.implicits._
    val topic = freshTopic("resume")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-broker-ckpt-").toString
    val seen = new ConcurrentLinkedQueue[String]()

    def run(): Unit = {
      val q = topic.readStream(admitPerTrigger = 16)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select("name").collect().foreach(r => seen.add(r.getString(0)))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    topic.publishSeed(Seq(("a", 0), ("b", 0), ("c", 0)).toDF("name", "numPublishes"))
    run()
    assert(seen.asScala.toSeq.sorted == Seq("a", "b", "c"))

    // traffic lands while the consumer is DOWN; the restart must pick up
    // exactly the new entries from its checkpointed cursor — a replay
    // would show a/b/c twice
    topic.publishSeed(Seq(("d", 0), ("e", 0)).toDF("name", "numPublishes"))
    run()
    assert(seen.asScala.toSeq.sorted == Seq("a", "b", "c", "d", "e"),
      "restart must resume from the committed offset without reprocessing")
  }

  test("batch read (readAll) sees the whole retained log") {
    import spark.implicits._
    val topic = freshTopic("batch")
    topic.publishSeed((0 until 7).map(i => (s"m$i", 0)).toDF("name", "numPublishes"))
    assert(topic.readAll().count() == 7)
    // envelope columns present with broker defaults applied
    val row = topic.readAll().select("topic", "deliveries", "not_before").head()
    assert(row.getString(0) == topic.name && row.getInt(1) == 0 && row.getLong(2) == 0L)
  }

  test("empty publishes never append (no empty-batch churn)") {
    import spark.implicits._
    val topic = freshTopic("empty")
    topic.publish(Seq.empty[(String, Int)].toDF("name", "numPublishes"))
    assert(InMemoryBroker.topic(topic.name).totalEntries == 0L)
  }

  test("admission splits the row budget across partitions, deterministically") {
    import graft.streaming.broker.{BrokerMicroBatchStream, BrokerOffsets}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import spark.implicits._
    val topic = freshTopic("admit")
    topic.publishSeed((0 until 10).map(i => (s"m$i", 0)).toDF("name", "numPublishes"))
    val log = InMemoryBroker.topic(topic.name)
    val stream = new BrokerMicroBatchStream(log.schema, topic.name, 3L)

    val start = BrokerOffsets.start(log)
    val end1 = stream.latestOffset(start, ReadLimit.maxRows(3L))
      .asInstanceOf[BrokerOffsets]
    assert(end1.parts.map { case (p, o) => o - start.parts(p) }.sum == 3L,
      s"exactly the budget must be admitted: $end1")
    // repeat from the same start: identical admission (no randomness)
    assert(stream.latestOffset(start, ReadLimit.maxRows(3L)) == end1)
    // unbounded admission drains every partition to its end
    val all = stream.latestOffset(start, ReadLimit.allAvailable())
      .asInstanceOf[BrokerOffsets]
    assert(all.parts == log.endOffsets && all.parts.values.sum == 10L)
  }

  test("a checkpoint cursor ahead of the log fails fast (lost-log restart)") {
    import graft.streaming.broker.{BrokerMicroBatchStream, BrokerOffsets}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val topic = freshTopic("lostlog") // empty log, as after a JVM restart
    val log = InMemoryBroker.topic(topic.name)
    val stream = new BrokerMicroBatchStream(log.schema, topic.name, 0L)
    val stale = BrokerOffsets(Map(0 -> 5L, 1 -> 0L, 2 -> 0L, 3 -> 0L))
    val e = intercept[IllegalArgumentException] {
      stream.latestOffset(stale, ReadLimit.allAvailable())
    }
    assert(e.getMessage.contains("log lost"),
      s"expected a clear lost-log diagnostic, got: ${e.getMessage}")
  }

  test("a not-yet-due entry is held at the broker until due (delayed delivery)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val topic = freshTopic("delay")
    // wide margin: a loaded host can take >1 s from publish to the
    // first trigger, and a margin the trigger can overrun makes the
    // held-entry assertion flaky (700 ms tripped exactly once in 15
    // rounds, on an interfered host)
    val due = System.currentTimeMillis() + 3000L
    topic.publish(Seq(("early", 0)).toDF("name", "numPublishes")
      .withColumn("not_before", lit(due)))

    val name = s"delay_${System.nanoTime()}"
    val query = topic.readStream(admitPerTrigger = 16)
      .writeStream.format("memory").queryName(name).start()
    try {
      // "all available" excludes the held entry: admission stops before it
      query.processAllAvailable()
      // belt-and-braces: only assert the hold if it was still observable
      // when the trigger finished — if the host stalled past `due`, the
      // early-delivery property is indistinguishable from due delivery
      if (System.currentTimeMillis() < due)
        assert(spark.table(name).count() == 0,
          "a not-yet-due entry must be held at the source, not delivered early")
      // once due, a later trigger admits it — no re-enqueue involved
      val deadline = System.currentTimeMillis() + 5000L
      while (spark.table(name).count() == 0
          && System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
      }
      assert(spark.table(name).count() == 1, "entry must be delivered once due")
      assert(System.currentTimeMillis() >= due,
        "delivery cannot precede the not_before stamp")
      // and exactly once: the hold never duplicated it in the log
      assert(InMemoryBroker.topic(topic.name).totalEntries == 1L)
    } finally query.stop()
  }

  test("keyed topics route same-key entries to one partition, in order") {
    import spark.implicits._
    val topic = BrokerTopic.create(spark,
      s"keyed-${System.nanoTime()}", Payloads.payloadSchema,
      numPartitions = 4, keyColumn = Some("name"))
    // 3 keys × 5 sequenced entries each, published in sequence order
    // with one row per publish (so producer-side batching cannot mask
    // misrouting)
    for (seq <- 0 until 5; k <- Seq("ka", "kb", "kc")) {
      topic.publishSeed(Seq((k, seq)).toDF("name", "numPublishes"))
    }
    val log = InMemoryBroker.topic(topic.name)
    val byPartition = (0 until 4).map { p =>
      p -> log.slice(p, 0L, log.endOffset(p))
        .map(r => (r.getString(0), r.getInt(1)))
    }.toMap
    // every key lives in exactly one partition
    val homes = byPartition.toSeq.flatMap { case (p, rows) =>
      rows.map { case (k, _) => (k, p) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(homes.keySet == Set("ka", "kb", "kc"))
    homes.foreach { case (k, ps) =>
      assert(ps.size == 1, s"key $k spread across partitions $ps")
    }
    // and within its partition, a key's entries appear in publish order
    byPartition.values.foreach { rows =>
      rows.groupBy(_._1).values.foreach { perKey =>
        assert(perKey.map(_._2) == perKey.map(_._2).sorted,
          s"per-key order broken: $perKey")
      }
    }
  }

  test("a durable topic resumes across a process boundary (new broker, same log dir)") {
    import spark.implicits._
    // Pulsar-standalone persistence (reference docker-compose.yaml:3-14):
    // the broker's log outlives the process, so a restarted consumer
    // resumes from its checkpointed subscription cursor. The JVM-local
    // stand-in for "fresh process": evict the topic from the registry
    // (memory log and file handles gone) and re-create it over the SAME
    // log dir — the in-memory twin would fail fast here (lost-log test).
    val name = s"durable-${System.nanoTime()}"
    val logDir = java.nio.file.Files.createTempDirectory("graft-broker-log-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-broker-ckpt-").toString
    val seen = new ConcurrentLinkedQueue[String]()

    def open(): BrokerTopic = BrokerTopic.create(spark, name,
      Payloads.payloadSchema, logDir = Some(logDir))
    def run(topic: BrokerTopic): Unit = {
      val q = topic.readStream(admitPerTrigger = 16)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select("name").collect().foreach(r => seen.add(r.getString(0)))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    val topic1 = open()
    topic1.publishSeed(Seq(("a", 0), ("b", 0), ("c", 0)).toDF("name", "numPublishes"))
    val endsBefore = InMemoryBroker.topic(name).endOffsets
    run(topic1)
    assert(seen.asScala.toSeq.sorted == Seq("a", "b", "c"))

    // process boundary: registry evicted, new broker instance over the
    // same directory must replay the log with identical offsets
    InMemoryBroker.deleteTopic(name)
    val topic2 = open()
    assert(InMemoryBroker.topic(name).endOffsets == endsBefore,
      "replayed log must restore every partition's end offset")

    // new traffic lands in the reopened log; the consumer restart must
    // RESUME from the checkpointed cursor — not fail fast (the memory
    // twin's behavior) and not replay a/b/c
    topic2.publishSeed(Seq(("d", 0), ("e", 0)).toDF("name", "numPublishes"))
    run(topic2)
    assert(seen.asScala.toSeq.sorted == Seq("a", "b", "c", "d", "e"),
      "restart across the process boundary must resume, not replay or fail")
  }

  test("an fsync'd durable topic appends, replays, and resumes identically") {
    import spark.implicits._
    // fsync changes WHEN bytes hit the device, never WHAT is written:
    // the log format, offsets, and replay must be byte-compatible with
    // the flush-only default (same files, same truncation rules)
    val name = s"fsync-${System.nanoTime()}"
    val logDir = java.nio.file.Files.createTempDirectory("graft-broker-fsync-").toString
    def open(): BrokerTopic = BrokerTopic.create(spark, name,
      Payloads.payloadSchema, logDir = Some(logDir), fsync = true)

    val topic1 = open()
    topic1.publishSeed(Seq(("a", 0), ("b", 0), ("c", 0)).toDF("name", "numPublishes"))
    val endsBefore = InMemoryBroker.topic(name).endOffsets
    assert(endsBefore.values.sum == 3L)

    // process boundary: a flush-only reopen over the same directory must
    // replay the fsync'd log bit-identically (and vice versa — the on-
    // disk format carries no durability-mode marker)
    InMemoryBroker.deleteTopic(name)
    val topic2 = BrokerTopic.create(spark, name,
      Payloads.payloadSchema, logDir = Some(logDir))
    assert(InMemoryBroker.topic(name).endOffsets == endsBefore)
    assert(topic2.readAll().select("name").collect().map(_.getString(0)).sorted
      .toSeq == Seq("a", "b", "c"))
    InMemoryBroker.deleteTopic(name)
  }

  test("consumer lag reports per-partition backlog and drains to zero") {
    import spark.implicits._
    import graft.streaming.broker.BrokerLag
    val topic = freshTopic("lag")
    val name = s"lag_${System.nanoTime()}"
    val query = topic.readStream(admitPerTrigger = 16)
      .writeStream.format("memory").queryName(name).start()
    try {
      topic.publishSeed((0 until 10).map(i => (s"m$i", 0)).toDF("name", "numPublishes"))
      query.processAllAvailable()
      assert(BrokerLag.totalLag(query, topic.name) == 0L,
        "a drained query has zero lag on every partition")
      // traffic lands while the consumer is stopped: lag = the backlog
      query.stop()
      topic.publishSeed((10 until 15).map(i => (s"m$i", 0)).toDF("name", "numPublishes"))
      val perPart = BrokerLag.lag(query, topic.name)
      assert(perPart.values.sum == 5L, s"expected 5 backlogged entries: $perPart")
      assert(perPart.keySet == InMemoryBroker.topic(topic.name).endOffsets.keySet)
    } finally if (query.isActive) query.stop()
  }

  test("a torn trailing block (crash mid-append) is dropped at replay; appends continue") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val name = s"torn-${System.nanoTime()}"
    val logDir = java.nio.file.Files.createTempDirectory("graft-broker-torn-")
    val schema = StructType(Seq(StructField("v", StringType), StructField("n", LongType)))
    // single partition so the torn file is deterministic
    val log1 = InMemoryBroker.createTopic(name, schema, numPartitions = 1,
      logDir = Some(logDir.toString))
    log1.append(0, Seq(Row("a", 1L), Row("b", 2L)))
    log1.append(0, Seq(Row("c", 3L)))
    InMemoryBroker.deleteTopic(name)

    // crash mid-append: chop bytes off the end of the partition file,
    // leaving the second block incomplete
    val f = logDir.resolve("part-0.log")
    val bytes = java.nio.file.Files.readAllBytes(f)
    java.nio.file.Files.write(f, java.util.Arrays.copyOf(bytes, bytes.length - 7))

    val log2 = InMemoryBroker.createTopic(name, schema, numPartitions = 1,
      logDir = Some(logDir.toString))
    assert(log2.endOffset(0) == 2L,
      "replay must keep the complete first block and drop the torn tail")
    assert(log2.slice(0, 0L, 2L).map(_.getString(0)) == Seq("a", "b"))
    // the reopened log accepts appends and they replay cleanly again
    log2.append(0, Seq(Row("d", 4L)))
    InMemoryBroker.deleteTopic(name)
    val log3 = InMemoryBroker.createTopic(name, schema, numPartitions = 1,
      logDir = Some(logDir.toString))
    assert(log3.slice(0, 0L, 3L).map(_.getString(0)) == Seq("a", "b", "d"))
    InMemoryBroker.deleteTopic(name)
  }

  test("a corrupt length prefix truncates to the valid prefix (no crash out of replay)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("v", StringType), StructField("n", LongType)))
    // a corrupt 4-byte prefix must be treated exactly like a torn tail:
    // negative (would throw NegativeArraySizeException out of topic
    // creation) and absurdly large (would OOM on allocation) both
    // truncate back to the last complete block
    for (badLen <- Seq(-1, Int.MaxValue)) {
      val name = s"badlen-$badLen-${System.nanoTime()}"
      val logDir = java.nio.file.Files.createTempDirectory("graft-broker-badlen-")
      val log1 = InMemoryBroker.createTopic(name, schema, numPartitions = 1,
        logDir = Some(logDir.toString))
      log1.append(0, Seq(Row("a", 1L), Row("b", 2L)))
      log1.append(0, Seq(Row("c", 3L)))
      InMemoryBroker.deleteTopic(name)

      // corrupt the SECOND block's length prefix in place (it sits right
      // after the first block: 4 length bytes + that block's payload)
      val f = logDir.resolve("part-0.log")
      val bytes = java.nio.file.Files.readAllBytes(f)
      val len1 = java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt
      java.nio.ByteBuffer.wrap(bytes, 4 + len1, 4).putInt(badLen)
      java.nio.file.Files.write(f, bytes)

      val log2 = InMemoryBroker.createTopic(name, schema, numPartitions = 1,
        logDir = Some(logDir.toString))
      assert(log2.endOffset(0) == 2L,
        s"replay with prefix $badLen must keep the first block and truncate")
      assert(log2.slice(0, 0L, 2L).map(_.getString(0)) == Seq("a", "b"))
      // the truncated log accepts appends and replays cleanly again
      log2.append(0, Seq(Row("d", 4L)))
      InMemoryBroker.deleteTopic(name)
      val log3 = InMemoryBroker.createTopic(name, schema, numPartitions = 1,
        logDir = Some(logDir.toString))
      assert(log3.slice(0, 0L, 3L).map(_.getString(0)) == Seq("a", "b", "d"))
      InMemoryBroker.deleteTopic(name)
    }
  }

  test("lag matches the topic description exactly (no prefix bleed between topics)") {
    import spark.implicits._
    import graft.streaming.broker.BrokerLag
    val base = s"lagx-${System.nanoTime()}"
    val topicA = BrokerTopic.create(spark, base, Payloads.payloadSchema)
    val topicB = BrokerTopic.create(spark, s"${base}2", Payloads.payloadSchema)
    topicA.publishSeed((0 until 5).map(i => (s"a$i", 0)).toDF("name", "numPublishes"))
    topicB.publishSeed((0 until 5).map(i => (s"b$i", 0)).toDF("name", "numPublishes"))
    val name = s"lagx_${System.nanoTime()}"
    val query = topicB.readStream(admitPerTrigger = 16)
      .writeStream.format("memory").queryName(name).start()
    try {
      query.processAllAvailable()
      assert(BrokerLag.totalLag(query, topicB.name) == 0L)
      // the query consumes `${base}2`; a contains-match on "topic=<base>"
      // would merge its drained cursors into <base>'s lag map and wrongly
      // cancel the untouched backlog
      assert(BrokerLag.totalLag(query, base) == 5L,
        "a query on topic 'X2' must not report progress against topic 'X'")
    } finally query.stop()
  }

  test("restart resumes per-partition cursors on a 4-partition topic") {
    import spark.implicits._
    val topic = BrokerTopic.create(spark,
      s"parts-${System.nanoTime()}", Payloads.payloadSchema, numPartitions = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-broker-ckpt-").toString
    val seen = new ConcurrentLinkedQueue[String]()

    def run(): Unit = {
      val q = topic.readStream(admitPerTrigger = 3)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select("name").collect().foreach(r => seen.add(r.getString(0)))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    topic.publishSeed((0 until 10).map(i => (s"m$i", 0)).toDF("name", "numPublishes"))
    run()
    assert(seen.asScala.toSeq.sorted == (0 until 10).map(i => s"m$i").sorted)

    // the producer round-robins, so a 10-row publish must actually SPREAD
    // across the 4 partition logs (this is what makes the per-partition
    // cursor test meaningful, not a single-log rerun)
    val ends = InMemoryBroker.topic(topic.name).endOffsets
    assert(ends.keySet == Set(0, 1, 2, 3))
    assert(ends.values.forall(_ > 0), s"expected all partitions non-empty: $ends")
    assert(ends.values.sum == 10L)

    // traffic lands while the consumer is DOWN; the restart must resume
    // each partition from ITS committed cursor — a replay of any
    // partition would surface duplicates
    topic.publishSeed((10 until 15).map(i => (s"m$i", 0)).toDF("name", "numPublishes"))
    run()
    assert(seen.asScala.toSeq.sorted == (0 until 15).map(i => s"m$i").sorted,
      "restart must resume every partition cursor without reprocessing")
  }
}
