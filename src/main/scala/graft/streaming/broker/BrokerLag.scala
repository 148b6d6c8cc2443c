package graft.streaming.broker

import org.apache.spark.sql.streaming.StreamingQuery

/** Consumer-lag observability for the broker source — the metric every
  * broker deployment watches (Pulsar's `msgBacklog` / Kafka's consumer
  * lag): how far each partition's log end is ahead of what the query has
  * processed. The reference surfaces the same signal through its metrics
  * tick (F8/F9, util/PulsarMetrics gauges); here it composes the two
  * sides the engine already exposes — the broker's `endOffsets` poll and
  * the query's last progress (its source end offsets are exactly the
  * [[BrokerOffsets]] JSON the checkpoint commits).
  */
object BrokerLag {

  /** Per-partition lag for `topic` as consumed by `query`: log end minus
    * the offset the query's last completed batch reached. A partition
    * the query has never read reports the full log length. Empty map if
    * the query has no progress yet.
    */
  def lag(query: StreamingQuery, topic: String): Map[Int, Long] = {
    val ends = InMemoryBroker.topic(topic).endOffsets
    val processed = Option(query.lastProgress).toSeq
      .flatMap(_.sources.toSeq)
      // EXACT description match (the shared format definition): a
      // contains-check on "topic=events" also matches "topic=events2"
      // and merges a different topic's offsets into this lag map
      .filter(s => Option(s.description)
        .contains(BrokerSourceProvider.sourceDescription(topic)))
      .flatMap(s => BrokerOffsets.fromJson(s.endOffset).parts)
      .toMap
    ends.map { case (p, e) => p -> math.max(e - processed.getOrElse(p, 0L), 0L) }
  }

  /** Total backlog across partitions. */
  def totalLag(query: StreamingQuery, topic: String): Long =
    lag(query, topic).values.sum
}
