package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Periodic progress gauges (reference C7: `scheduleAtFixedRate` logging
  * "N messages in progress", part2/MessageProcessor.scala:35-45, and the
  * executor's Running/Queued/Offered report,
  * part3/PermittedTaskExecutor.scala:181-187).
  *
  * Spark publishes the same signals for free through
  * `StreamingQueryListener`: rows per trigger, processing rates, and
  * termination (the reference's supervision observation, C4). This
  * listener snapshots them per query name so tests can assert the
  * log-proofs executably (SURVEY §5.2).
  */
final class Gauges extends StreamingQueryListener {

  final case class Snapshot(
      batches: Long, totalRows: Long, lastBatchRows: Long, maxBatchRows: Long,
      terminated: Boolean, error: Option[String])

  private val byName = TrieMap[String, Snapshot]()
  private val byId = TrieMap[java.util.UUID, String]()

  def snapshot(name: String): Option[Snapshot] = byName.get(name)
  def all: Map[String, Snapshot] = byName.toMap

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    byId.put(e.id, e.name)
    byName.putIfAbsent(e.name, Snapshot(0, 0, 0, 0, terminated = false, None))
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val name = e.progress.name
    val prev = byName.getOrElse(name, Snapshot(0, 0, 0, 0, terminated = false, None))
    byName.put(name, prev.copy(
      batches = prev.batches + 1,
      totalRows = prev.totalRows + e.progress.numInputRows,
      lastBatchRows = e.progress.numInputRows,
      maxBatchRows = math.max(prev.maxBatchRows, e.progress.numInputRows)))
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    byId.get(e.id).foreach { name =>
      byName.updateWith(name)(_.map(_.copy(terminated = true,
        error = e.exception)))
    }
}
