package graft.streaming.broker

import java.util

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-V2 connector for [[InMemoryBroker]] — the real S1 source
  * path (reference part1/PulsarPekkoSource.scala:44-131), replacing the
  * scaladoc-only mapping the file topic carried.
  *
  * Semantics mapping onto the reference graph stage:
  *  - **demand-driven pull** (`onPull → receiveAsync`, `:63-65`): the
  *    engine calls `latestOffset(start, limit)` once per trigger and pulls
  *    exactly the admitted slice — demand originates at the engine, the
  *    broker buffers the rest (C3 `inputBuffer(0,1)` intent);
  *  - **admission bound** (`receiverQueueSize`,
  *    util/PulsarClientWrapper.scala:169): `maxRowsPerTrigger` via
  *    [[SupportsAdmissionControl]] `ReadLimit.maxRows` — one trigger never
  *    admits more than the bound, however deep the backlog; the bound is
  *    split across partitions proportionally to their backlog;
  *  - **partitioned topics** (the reference consumes `-partition-N`
  *    sub-topics, part3/LimitedMessageProcessor.scala:75): offsets are a
  *    partition→cursor map, `planInputPartitions` emits one task per
  *    partition slice, and each task's reader fetches ITS partition's
  *    slice from the broker — rows never round-trip through the driver
  *    (the Kafka/Pulsar-source shape);
  *  - **delayed delivery** (`deliverAfter` — the reference's
  *    `negativeAckRedeliveryDelay`, util/PulsarClientWrapper.scala:171):
  *    `latestOffset` admits only each partition's deliverable prefix, so
  *    an entry stamped `not_before` in the future is HELD at the broker
  *    until due — consumers never see it early and nothing re-enqueues
  *    it (see `TopicLog.admissibleEnd`);
  *  - **cursor/ack** (`acknowledgeAsync`): the streaming checkpoint is the
  *    subscription cursor; `initialOffset` starts a new subscription at 0
  *    and a restart resumes from the last committed offsets via
  *    `deserializeOffset` — the broker log is never truncated by reads
  *    (broker retention), so `commit` is a no-op;
  *  - **graceful drain** (ShutdownHook `:75-81`): `query.stop()` between
  *    batches + checkpoint resumability.
  *
  * Usage: `spark.readStream.format("graft-broker").option("topic", t)
  * .option("maxRowsPerTrigger", n).load()` — or through [[BrokerTopic]].
  */
final class BrokerSourceProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-broker"

  private def topicName(options: CaseInsensitiveStringMap): String = {
    val t = options.get("topic")
    require(t != null && t.nonEmpty, "option 'topic' is required for graft-broker")
    t
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    InMemoryBroker.topic(topicName(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BrokerTable(schema, properties.get("topic"))
}

object BrokerSourceProvider {
  /** The ONE streaming-progress source-description format. BrokerLag
    * matches `SourceProgress.description` against this string EXACTLY
    * (equality, not substring — "topic=events" must not match
    * "topic=events2"), so every producer of the description and its one
    * consumer share this definition: change it here or lag reporting
    * silently sees an empty processed map.
    */
  def sourceDescription(topic: String): String = s"graft-broker topic=$topic"
}

final class BrokerTable(schema: StructType, topic: String)
    extends Table with SupportsRead {

  override def name(): String = s"graft-broker:$topic"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BrokerScan(schema, topic, options.getLong("maxRowsPerTrigger", 0L))
}

final class BrokerScan(schema: StructType, topic: String,
    maxRowsPerTrigger: Long) extends ScanBuilder with Scan {

  override def build(): Scan = this
  override def readSchema(): StructType = schema
  override def description(): String =
    BrokerSourceProvider.sourceDescription(topic)

  override def toBatch: Batch = new BrokerBatch(schema, topic)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BrokerMicroBatchStream(schema, topic, maxRowsPerTrigger)
}

/** Stream offset = one cursor PER PARTITION (the Kafka/Pulsar source
  * shape); serialized as a sorted-key JSON object, e.g. `{"0":5,"1":3}`.
  */
final case class BrokerOffsets(parts: Map[Int, Long]) extends Offset {
  override def json: String =
    parts.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")
}

object BrokerOffsets {
  def fromJson(json: String): BrokerOffsets = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) BrokerOffsets(Map.empty)
    else BrokerOffsets(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":").map(_.trim)
      k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toLong
    }.toMap)
  }

  /** All of `log`'s partitions at cursor 0 (a fresh subscription). */
  def start(log: InMemoryBroker.TopicLog): BrokerOffsets =
    BrokerOffsets((0 until log.numPartitions).map(_ -> 0L).toMap)
}

/** Offset-tracked, admission-bounded micro-batch stream over one topic. */
final class BrokerMicroBatchStream(schema: StructType, topic: String,
    maxRowsPerTrigger: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def log = InMemoryBroker.topic(topic)

  // the streaming-progress source description (SourceProgress.description
  // is this toString) — BrokerLag matches it EXACTLY, via the one shared
  // format definition
  override def toString: String =
    BrokerSourceProvider.sourceDescription(topic)

  // a fresh subscription starts at every partition's log head; restarts
  // never come here (the engine deserializes the checkpointed cursors)
  override def initialOffset(): Offset = BrokerOffsets.start(log)

  override def deserializeOffset(json: String): Offset = BrokerOffsets.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerTrigger > 0) ReadLimit.maxRows(maxRowsPerTrigger)
    else ReadLimit.allAvailable()

  // the single-arg form must not be called once SupportsAdmissionControl
  // is implemented (same contract as the built-in rate/kafka sources)
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[BrokerOffsets].parts
    val ends = log.endOffsets
    // fail fast instead of silently planning an inverted range: a cursor
    // ahead of the log means the JVM-local log was lost (fresh process
    // reusing an old checkpoint) — resuming would replay from garbage
    ends.foreach { case (p, end) =>
      val f = from.getOrElse(p, 0L)
      require(end >= f,
        s"broker topic '$topic' partition $p: checkpointed cursor $f is ahead " +
          s"of the log end $end — JVM-local log lost; delete the checkpoint " +
          "or re-seed the broker")
    }
    // delayed-delivery hold: admit only each partition's deliverable
    // prefix — an entry stamped `not_before` in the future (and anything
    // behind it in its partition) stays at the broker until due
    val now = System.currentTimeMillis()
    val due = ends.map { case (p, _) =>
      p -> log.admissibleEnd(p, from.getOrElse(p, 0L), now)
    }
    limit match {
      case r: ReadMaxRows => BrokerOffsets(admit(from, due, r.maxRows()))
      case _ => BrokerOffsets(due)
    }
  }

  /** Split a row budget across partitions proportionally to backlog
    * (floor), remainder round-robin by ascending partition id —
    * deterministic, and total admitted == min(budget, total backlog).
    */
  private def admit(from: Map[Int, Long], ends: Map[Int, Long],
      budget: Long): Map[Int, Long] = {
    val avail = ends.map { case (p, e) => p -> (e - from.getOrElse(p, 0L)) }
    val total = avail.values.sum
    if (total <= budget) ends
    else {
      val ids = avail.keys.toSeq.sorted
      val adm = scala.collection.mutable.Map(
        ids.map(p => p -> avail(p) * budget / total): _*)
      var left = budget - adm.values.sum
      var i = 0
      while (left > 0) { // terminates: total > budget ⇒ spare backlog exists
        val p = ids(i % ids.size)
        if (adm(p) < avail(p)) { adm(p) += 1; left -= 1 }
        i += 1
      }
      ids.map(p => p -> (from.getOrElse(p, 0L) + adm(p))).toMap
    }
  }

  override def reportLatestOffset(): Offset = BrokerOffsets(log.endOffsets)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    BrokerPartitions.plan(topic,
      start.asInstanceOf[BrokerOffsets].parts,
      end.asInstanceOf[BrokerOffsets].parts)

  override def createReaderFactory(): PartitionReaderFactory =
    new BrokerReaderFactory(schema)

  // broker retention: the log outlives the subscription cursor
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Batch scan over the whole log (the `readAll` path). */
final class BrokerBatch(schema: StructType, topic: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val log = InMemoryBroker.topic(topic)
    BrokerPartitions.plan(topic, Map.empty, log.endOffsets)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new BrokerReaderFactory(schema)
}

private object BrokerPartitions {
  /** One task per broker partition with a non-empty admitted range. The
    * task carries only `(topic, partition, from, until)` — the reader
    * fetches the rows on the executor, so nothing is materialized on the
    * driver (on a cluster this fetch is the broker-client read).
    */
  def plan(topic: String, from: Map[Int, Long], until: Map[Int, Long])
      : Array[InputPartition] =
    until.toSeq.sortBy(_._1).collect {
      case (p, end) if end > from.getOrElse(p, 0L) =>
        BrokerInputPartition(topic, p, from.getOrElse(p, 0L), end): InputPartition
    }.toArray
}

final case class BrokerInputPartition(topic: String, partition: Int,
    from: Long, until: Long) extends InputPartition

final class BrokerReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val bp = partition.asInstanceOf[BrokerInputPartition]
    // executor-side fetch of this task's partition slice (JVM-local
    // broker in local mode; a broker-client read on a real cluster)
    val rows = InMemoryBroker.topic(bp.topic).slice(bp.partition, bp.from, bp.until)
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = toCatalyst(rows(i)).asInstanceOf[InternalRow]
      override def close(): Unit = ()
    }
  }
}
