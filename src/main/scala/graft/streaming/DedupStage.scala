package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup — the streaming twin of the batch dedup operator
  * (q21) and the engine-side guard against redelivery duplicates (the
  * reference's at-least-once retry loop re-publishes messages, so any
  * downstream consumer needs idempotence; reference F10's set-membership
  * guard is the same idea driver-side).
  *
  * Uses `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: on an
  * unbounded stream the dedup state must be evictable, and the watermark
  * horizon is the contract for how late a duplicate can arrive. State
  * size is O(distinct keys within the horizon), independent of stream
  * length — the property that keeps this viable on an unbounded 100 TB/day
  * ingest. Keys are hashed-partitioned by Spark's stateful operator, so
  * dedup state shards across executors with no coordination.
  */
object DedupStage {

  /** Keep the first arrival per key set; duplicates arriving within
    * `delay` of the watermark are dropped, later ones are out of
    * contract. `eventTimeCol` must be a timestamp column.
    */
  def withinWatermark(df: DataFrame, eventTimeCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
