package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel detection (CEP-lite): the continuous twin of the
  * batch funnel (q53). Per user, a state machine advances through
  * view → click → purchase on event-time order and emits one completion
  * row the moment the final stage lands — across micro-batches, however
  * far apart the stages arrive.
  *
  * Scale/state story:
  *  - state per user is THREE longs (stage + two stage timestamps) —
  *    independent of event volume;
  *  - state is expired through `EventTimeTimeout`: a user idle past
  *    `ttl` (in watermark time) is dropped, so abandoned funnels can
  *    never accumulate — the state size is bounded by the number of
  *    users ACTIVE within the TTL horizon, not by history (reference C3
  *    bounded-resources stance applied to streaming state);
  *  - rows are processed in event-time order WITHIN a batch (sorted in
  *    the handler — Spark does not order rows inside a group) and
  *    batches are watermark-ordered across time, so stage advancement is
  *    deterministic for in-watermark data.
  */
object FunnelStream {

  /** Carries the watermarked `ts` column through the typed pipeline:
    * EventTimeTimeout requires the watermark attribute to be present in
    * the grouped Dataset, so it must survive into the event type.
    */
  final case class FunnelEvent(user_id: Long, event_type: String, tus: Long,
      ts: Timestamp)
  /** stage: 0 = nothing yet, 1 = view seen, 2 = view+click seen. */
  final case class FunnelProgress(stage: Int, viewTus: Long, clickTus: Long)
  final case class FunnelCompletion(user_id: Long, view_tus: Long,
      click_tus: Long, purchase_tus: Long)

  /** @param events streaming DataFrame with (user_id, event_type, ts)
    * @param watermarkDelay how much event-time lateness to tolerate
    * @param ttlMs idle horizon (watermark time) after which a user's
    *              partial funnel is forgotten
    */
  def completions(events: DataFrame, watermarkDelay: String = "10 minutes",
      ttlMs: Long = 60 * 60 * 1000L): Dataset[FunnelCompletion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("ts"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[FunnelEvent],
            state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) {
            // idle past TTL: forget the partial funnel (bounded state)
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelProgress(0, 0L, 0L))
            val out = List.newBuilder[FunnelCompletion]
            rows.toList.sortBy(e => (e.tus, e.event_type)).foreach { e =>
              (st.stage, e.event_type) match {
                case (0, "view") => st = FunnelProgress(1, e.tus, 0L)
                case (1, "click") if e.tus > st.viewTus =>
                  st = FunnelProgress(2, st.viewTus, e.tus)
                case (2, "purchase") if e.tus > st.clickTus =>
                  out += FunnelCompletion(user, st.viewTus, st.clickTus, e.tus)
                  st = FunnelProgress(0, 0L, 0L) // re-arm for the next pass
                case _ => () // stage-irrelevant event: no transition
              }
            }
            if (st.stage == 0) state.remove()
            else {
              state.update(st)
              // TTL measured from the LAST stage advancement, in
              // watermark time: when the watermark passes it, the
              // partial funnel is abandoned. Clamped to watermark+1:
              // a stage-irrelevant event arriving after the TTL horizon
              // would otherwise re-set a timeout already behind the
              // watermark, which Spark rejects and kills the query.
              val sinceTus = math.max(st.viewTus, st.clickTus)
              state.setTimeoutTimestamp(
                math.max(sinceTus / 1000L + ttlMs,
                  state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }
}
