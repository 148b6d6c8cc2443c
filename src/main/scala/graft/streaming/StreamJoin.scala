package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream interval equi-join with bounded state.
  *
  * Both inputs are watermarked and the join carries a time-interval
  * bound; together they let Spark EVICT join state once the watermark
  * passes the interval — without them a stream-stream join buffers both
  * streams forever. State size is O(rows within the interval horizon) per
  * key, independent of stream length: the property that keeps a
  * clicks⋈impressions-style join viable on an unbounded 100 TB/day feed.
  * The key equality shuffles both streams to the same state-store
  * partitions, so matching is local per micro-batch.
  */
object StreamJoin {

  /** Inner-join rows of `left` with rows of `right` on `key` whose event
    * times satisfy `rightTs ∈ [leftTs - before, leftTs + after]`.
    * Column names must be disjoint apart from the key columns given.
    */
  def interval(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      keyEquality: String,
      watermarkDelay: String,
      before: String, after: String): DataFrame =
    left.withWatermark(leftTs, watermarkDelay)
      .join(
        right.withWatermark(rightTs, watermarkDelay),
        expr(s"""$keyEquality AND
                | $rightTs >= $leftTs - INTERVAL $before AND
                | $rightTs <= $leftTs + INTERVAL $after""".stripMargin))
}
