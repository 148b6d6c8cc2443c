package graft.streaming.broker

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream, ObjectInputStream, ObjectOutputStream}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** An embedded message broker: named PARTITIONED append-only logs with
  * monotonically increasing per-partition offsets — the stand-in for the
  * reference's Pulsar standalone (S1, part1/PulsarPekkoSource.scala;
  * partitioned topics are visible in the reference's `-partition-0`
  * normalization, part3/LimitedMessageProcessor.scala:75).
  *
  * Only the broker SEMANTICS the source contract needs are modeled:
  *  - a topic is N independent ordered logs (partitions); an entry's
  *    offset is its position in ITS partition's log;
  *  - keyless producers spread entries round-robin across partitions
  *    (the sticky/round-robin default every partitioned broker ships);
  *  - the log is retained after consumption (consumers track their own
  *    per-partition cursor — here, the streaming checkpoint);
  *  - appends are atomic and ordered per partition;
  *  - OPTIONALLY durable: a topic created with a `logDir` persists every
  *    append to a per-partition file (length-prefixed blocks) and
  *    replays it on (re)creation — the Pulsar-standalone persistence
  *    property (reference docker-compose.yaml:3-14): a fresh process
  *    that re-creates the topic over the same directory RESUMES from
  *    the checkpointed subscription cursor, because the log and its
  *    offsets survive the process. A torn trailing block (crash mid
  *    append) is dropped at replay — append-log recovery semantics.
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
    * dense offsets [0, endOffset(p)). With a `logDir`, each partition
    * log is mirrored to `logDir/part-N.log` and replayed on open.
    *
    * Durability levels (`fsync`):
    *  - `false` (default): every append is flushed to the OS — survives
    *    PROCESS crashes (kill -9), not an OS/power crash that loses the
    *    page cache. This matches a broker configured without journal
    *    fsync, and is what the replay/torn-tail specs exercise.
    *  - `true`: `FileChannel.force(false)` after every append — the
    *    bookie-journal default of the reference's Pulsar/BookKeeper
    *    stack: an acknowledged append survives an OS crash too, at the
    *    cost of a device sync per commit (orders of magnitude slower on
    *    spinning/virtualized disks; group-commit batching is the
    *    standard mitigation and falls out of per-batch appends here).
    */
  final class TopicLog(val topic: String, val schema: StructType,
      val numPartitions: Int, logDir: Option[File] = None,
      fsync: Boolean = false) {
    require(numPartitions > 0, s"topic '$topic' needs >= 1 partition")

    private val parts = Array.fill(numPartitions)(ArrayBuffer.empty[Row])
    private val rr = new AtomicLong(0L)

    // ---- durability -----------------------------------------------------
    // One append-only file per partition; each append writes one
    // [int length][java-serialized Seq[Row]] block and flushes. Replay
    // stops at the first incomplete or undecodable block (torn tail from
    // a crash) and the file is TRUNCATED back to the last complete block
    // before the append stream opens — without that, a block appended
    // after a torn fragment would sit at a misaligned offset and poison
    // every later replay.
    private val partStreams: Array[Option[FileOutputStream]] =
      logDir match {
        case None => Array.fill(numPartitions)(None)
        case Some(dir) =>
          dir.mkdirs()
          Array.tabulate(numPartitions) { p =>
            val f = new File(dir, s"part-$p.log")
            if (f.exists()) {
              val validLen = replay(f, parts(p))
              if (validLen < f.length()) {
                val raf = new java.io.RandomAccessFile(f, "rw")
                try raf.setLength(validLen) finally raf.close()
              }
            }
            Some(new FileOutputStream(f, true))
          }
      }
    private val partFiles: Array[Option[DataOutputStream]] =
      partStreams.map(_.map(new DataOutputStream(_)))

    /** Replays complete blocks into `into`; returns the byte length of
      * the valid prefix (everything past it is a torn/corrupt tail).
      */
    private def replay(f: File, into: ArrayBuffer[Row]): Long = {
      val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f)))
      var valid = 0L
      try {
        var done = false
        while (!done) {
          val len =
            try in.readInt()
            catch { case _: EOFException => done = true; -1 }
          if (!done) {
            // a corrupt LENGTH PREFIX is a corrupt tail too: validate
            // before allocating, or a negative/huge len throws
            // NegativeArraySizeException / OOMs out of topic creation
            // instead of truncating to the valid prefix
            if (len <= 0 || len > f.length() - valid - 4L) done = true
            else try {
              val buf = new Array[Byte](len)
              in.readFully(buf)
              val ois = new ObjectInputStream(new ByteArrayInputStream(buf))
              into ++= ois.readObject().asInstanceOf[Seq[Row]]
              valid += 4L + len
            } catch {
              // EOF = torn tail; anything else = corrupt tail — block
              // boundaries past it are lost either way, so stop here
              case scala.util.control.NonFatal(_) => done = true
            }
          }
        }
        valid
      } finally in.close()
    }

    private def persist(p: Int, rows: Seq[Row]): Unit = partFiles(p).foreach { out =>
      val bytes = new ByteArrayOutputStream()
      val oos = new ObjectOutputStream(bytes)
      oos.writeObject(rows.toVector: Seq[Row])
      oos.close()
      out.writeInt(bytes.size())
      bytes.writeTo(out)
      out.flush()
      // opt-in OS-crash durability: force data (not metadata — the file
      // is append-only, so size recovery rides the torn-tail truncation)
      // to the device before the append is acknowledged
      if (fsync) partStreams(p).foreach(_.getChannel.force(false))
    }

    /** Release file handles (process shutdown / registry eviction). The
      * log files themselves are retained — re-creating the topic over
      * the same directory reopens them.
      */
    def close(): Unit = partFiles.foreach(_.foreach(_.close()))

    /** Atomic ordered append to one partition; returns its new end offset. */
    def append(partition: Int, rows: Seq[Row]): Long = {
      val p = parts(partition)
      p.synchronized { p ++= rows; persist(partition, rows); p.length.toLong }
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
    * different count returns the existing topic unchanged. With a
    * `logDir`, the topic is durable: creation replays any existing log
    * files under the directory, so offsets (and the subscription
    * cursors pointing into them) survive process restarts.
    */
  def createTopic(name: String, schema: StructType, numPartitions: Int = 4,
      logDir: Option[String] = None, fsync: Boolean = false): TopicLog =
    // synchronized: TrieMap.getOrElseUpdate may evaluate the thunk twice
    // under a race, and a losing DURABLE TopicLog would leave its append
    // streams open forever (topic creation is rare topology setup — the
    // hot paths, append/slice/endOffsets, never take this lock)
    synchronized {
      topics.getOrElseUpdate(name,
        new TopicLog(name, schema, numPartitions, logDir.map(new File(_)), fsync))
    }

  def topic(name: String): TopicLog =
    topics.getOrElse(name,
      throw new NoSuchElementException(s"broker topic '$name' does not exist"))

  /** Evict from the JVM-local registry, closing any log-file handles.
    * Durable topics keep their files (broker retention) — re-creating
    * over the same `logDir` replays them, which is also how a process
    * restart is simulated in tests.
    */
  def deleteTopic(name: String): Unit = topics.remove(name).foreach(_.close())
}
