package graft.streaming.broker

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** An embedded, JVM-local message broker: named append-only logs with
  * monotonically increasing per-entry offsets — the stand-in for the
  * reference's Pulsar standalone (S1, part1/PulsarPekkoSource.scala).
  *
  * Only the broker SEMANTICS the source contract needs are modeled:
  *  - an entry's offset is its position in the topic log (the ledger id);
  *  - the log is retained after consumption (consumers track their own
  *    cursor — here, the streaming checkpoint);
  *  - appends are atomic and ordered.
  *
  * Local-mode scope: the registry is a JVM singleton, which is exactly
  * right for `local[n]` (driver and executors share the JVM). On a real
  * cluster the [[BrokerMicroBatchStream]] stays identical and only the
  * [[TopicLog]] access inside `planInputPartitions` (driver-side) and the
  * producer side become broker-client calls — the offset/commit protocol
  * is the part a distributed connector actually has to get right, and it
  * is fully exercised here.
  */
object InMemoryBroker {

  /** One topic's append-only log. Offsets are dense [0, endOffset). */
  final class TopicLog(val topic: String, val schema: StructType) {
    private val log = ArrayBuffer.empty[Row]

    /** Atomic ordered append; returns the new end offset. */
    def append(rows: Seq[Row]): Long = synchronized {
      log ++= rows
      log.length.toLong
    }

    /** The offset one past the last entry (the next entry's offset). */
    def endOffset: Long = synchronized(log.length.toLong)

    /** Entries with offsets in [from, until) — the micro-batch slice. */
    def slice(from: Long, until: Long): Seq[Row] = synchronized {
      log.slice(from.toInt, math.min(until, log.length.toLong).toInt).toVector
    }
  }

  private val topics = TrieMap.empty[String, TopicLog]

  /** Idempotent create (broker auto-creation semantics). */
  def createTopic(name: String, schema: StructType): TopicLog =
    topics.getOrElseUpdate(name, new TopicLog(name, schema))

  def topic(name: String): TopicLog =
    topics.getOrElse(name,
      throw new NoSuchElementException(s"broker topic '$name' does not exist"))

  def deleteTopic(name: String): Unit = topics.remove(name)
}
