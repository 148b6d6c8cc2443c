package graft.streaming.broker

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** An embedded, JVM-local message broker: named PARTITIONED append-only
  * logs with monotonically increasing per-partition offsets — the
  * stand-in for the reference's Pulsar standalone (S1,
  * part1/PulsarPekkoSource.scala; partitioned topics are visible in the
  * reference's `-partition-0` normalization,
  * part3/LimitedMessageProcessor.scala:75).
  *
  * Only the broker SEMANTICS the source contract needs are modeled:
  *  - a topic is N independent ordered logs (partitions); an entry's
  *    offset is its position in ITS partition's log;
  *  - keyless producers spread entries round-robin across partitions
  *    (the sticky/round-robin default every partitioned broker ships);
  *  - the log is retained after consumption (consumers track their own
  *    per-partition cursor — here, the streaming checkpoint);
  *  - appends are atomic and ordered per partition.
  *
  * Local-mode scope: the registry is a JVM singleton, which is exactly
  * right for `local[n]` (driver and executors share the JVM). On a real
  * cluster the [[BrokerMicroBatchStream]] stays identical and only the
  * [[TopicLog]] access becomes a broker-client call — on the driver the
  * `endOffsets` poll inside `latestOffset`, on the executors the
  * per-partition `slice` fetch inside the partition reader. The
  * offset/commit protocol is the part a distributed connector actually
  * has to get right, and it is fully exercised here.
  */
object InMemoryBroker {

  /** One topic: `numPartitions` append-only partition logs, each with
    * dense offsets [0, endOffset(p)).
    */
  final class TopicLog(val topic: String, val schema: StructType,
      val numPartitions: Int) {
    require(numPartitions > 0, s"topic '$topic' needs >= 1 partition")

    private val parts = Array.fill(numPartitions)(ArrayBuffer.empty[Row])
    private val rr = new AtomicLong(0L)

    /** Atomic ordered append to one partition; returns its new end offset. */
    def append(partition: Int, rows: Seq[Row]): Long = {
      val p = parts(partition)
      p.synchronized { p ++= rows; p.length.toLong }
    }

    /** Keyless producer routing: per-entry round-robin across partitions
      * (deterministic given append order — a global counter, not random).
      */
    def append(rows: Seq[Row]): Unit = if (rows.nonEmpty) {
      val base = rr.getAndAdd(rows.size.toLong)
      rows.zipWithIndex
        .groupBy { case (_, i) => ((base + i) % numPartitions).toInt }
        .foreach { case (p, grouped) => append(p, grouped.map(_._1)) }
    }

    /** Key-based producer routing (the broker's key→partition hash —
      * Pulsar keyed/KeyShared producers, Kafka keyed records): every
      * entry with the same key lands in the same partition, so
      * per-partition append order IS per-key order end-to-end. NULL
      * keys route to partition 0.
      */
    def appendKeyed(rows: Seq[Row], keyIdx: Int): Unit = if (rows.nonEmpty) {
      rows.groupBy { r =>
        if (r.isNullAt(keyIdx)) 0
        else {
          val h = graft.functions.PolyHash.hash(String.valueOf(r.get(keyIdx)))
          (h % numPartitions).toInt
        }
      }.foreach { case (p, grouped) => append(p, grouped) }
    }

    /** The offset one past partition `p`'s last entry. */
    def endOffset(p: Int): Long = {
      val part = parts(p)
      part.synchronized(part.length.toLong)
    }

    /** Every partition's end offset (the per-trigger driver poll). */
    def endOffsets: Map[Int, Long] =
      (0 until numPartitions).map(p => p -> endOffset(p)).toMap

    // position of the delayed-delivery stamp in the envelope, if the
    // topic carries one (-1 otherwise: everything is always deliverable)
    private val notBeforeIdx = schema.fieldNames.indexOf("not_before")

    /** End of partition `p`'s DELIVERABLE prefix from `from`: the scan
      * stops at the first entry stamped `not_before > nowMs`. This is the
      * broker-side delayed-delivery hold (`deliverAfter` — reference
      * `negativeAckRedeliveryDelay`, util/PulsarClientWrapper.scala:171):
      * a deferred entry is simply not admitted until due, so consumers
      * never see it early and nothing has to re-enqueue it. Holding also
      * everything BEHIND it preserves per-partition order (offsets stay
      * dense); other partitions keep flowing.
      */
    def admissibleEnd(p: Int, from: Long, nowMs: Long): Long = {
      if (notBeforeIdx < 0) return endOffset(p)
      val part = parts(p)
      part.synchronized {
        var i = math.max(from, 0L).toInt
        while (i < part.length) {
          val r = part(i)
          val nb = if (r.isNullAt(notBeforeIdx)) 0L else r.getLong(notBeforeIdx)
          if (nb > nowMs) return i.toLong
          i += 1
        }
        part.length.toLong
      }
    }

    /** Total entries across partitions (diagnostics/tests). */
    def totalEntries: Long = (0 until numPartitions).map(endOffset).sum

    /** Partition `p`'s entries with offsets in [from, until) — one
      * micro-batch task's slice, fetched by the partition reader.
      */
    def slice(p: Int, from: Long, until: Long): Seq[Row] = {
      val part = parts(p)
      part.synchronized {
        part.slice(from.toInt, math.min(until, part.length.toLong).toInt).toVector
      }
    }
  }

  private val topics = TrieMap.empty[String, TopicLog]

  /** Idempotent create (broker auto-creation semantics). A topic's
    * partition count is fixed at creation; a later create with a
    * different count returns the existing topic unchanged.
    */
  def createTopic(name: String, schema: StructType, numPartitions: Int = 4): TopicLog =
    topics.getOrElseUpdate(name, new TopicLog(name, schema, numPartitions))

  def topic(name: String): TopicLog =
    topics.getOrElse(name,
      throw new NoSuchElementException(s"broker topic '$name' does not exist"))

  def deleteTopic(name: String): Unit = topics.remove(name)
}
