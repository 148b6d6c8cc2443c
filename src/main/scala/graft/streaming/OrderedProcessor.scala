package graft.streaming

import graft.functions.PolyHash
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key strictly-ordered processing over an unbounded keyspace
  * (reference part 5: Pulsar Key_Shared + `ZStream.groupByKey(_.getKey,
  * buffer = 1)` + `mapZIOPar(1)`,
  * part5/OrderedStreamGenerator.scala:122-164).
  *
  * Spark mapping: `groupByKey(_.key)` shuffles each key to exactly one
  * task (the Key_Shared routing), and `flatMapGroupsWithState` processes a
  * key's rows serially by construction (`mapZIOPar(1)`), with state
  * carrying ordering guarantees ACROSS micro-batches — the piece SURVEY
  * §7.4 calls the hardest: a failed (nacked) message must not be overtaken
  * by a later message of the same key.
  *
  * Protocol per key and micro-batch:
  *  1. pending retries (state) are prepended to the batch's new messages;
  *  2. messages are processed in `seq` order, one at a time;
  *  3. on failure, processing of the key STOPS — the failed message and
  *     every later one are buffered to state (no overtaking, ≤1 in-flight
  *     per key), retried on the key's next activation;
  *  4. `attempts` is tracked per message; `maxAttempts` exceeded →
  *     emitted with `status = "dead"` (dead-letter), key unblocked.
  *
  * Emitted `numPublishes` is the republish hop (reference
  * part5/OrderedMessageProcessor.scala:28-29), so per-key monotonicity of
  * (seq, numPublishes) is the observable ordering proof — the executable
  * version of the reference's log-based gauge proof
  * (part5/OrderedMessageProcessor.scala:66-79).
  */
object OrderedProcessor {

  final case class Msg(key: String, seq: Long, name: String, numPublishes: Int)
  final case class Out(key: String, seq: Long, name: String, numPublishes: Int,
      attempts: Int, status: String)

  /** Retry buffer: the per-key state. `attempts` counts failed attempts of
    * the HEAD message (only the head can be in retry — everything behind
    * it is blocked, preserving order).
    */
  final case class KeyState(pending: List[Msg], headAttempts: Int)

  implicit val msgEncoder: Encoder[Msg] = Encoders.product[Msg]
  implicit val outEncoder: Encoder[Out] = Encoders.product[Out]
  implicit val stateEncoder: Encoder[KeyState] = Encoders.product[KeyState]
  implicit val keyEncoder: Encoder[String] = Encoders.STRING

  /** Deterministic processor: fails the first `attempt` of ~failPercent%
    * of messages (content-hash bucket), succeeds on retry — the seeded
    * analog of reference F6.
    */
  def deterministicFailure(failPercent: Int)(m: Msg, attempt: Int): Boolean =
    attempt == 0 && PolyHash.hash(s"${m.key}/${m.seq}/${m.name}") % 100 < failPercent

  /** Default cap on a blocked key's buffered backlog. No-overtaking
    * REQUIRES buffering everything behind a retrying head, but an
    * unbounded buffer lets one never-succeeding key grow state linearly
    * with arrivals; past the cap the newest messages overflow to the
    * dead-letter path (status = "overflow") — the engine-state analog of
    * the reference's `buffer = 1` + bounded broker-side buffering
    * (part5/OrderedStreamGenerator.scala:137, Key_Shared prefetch bound).
    */
  val DefaultMaxPending = 1024

  def apply(input: Dataset[Msg], failPercent: Int = 10, maxAttempts: Int = 5)
      : Dataset[Out] =
    run(input, deterministicFailure(failPercent), maxAttempts)

  /** @param retryBackoffMs when set, a blocked key retries its head after
    *   this delay even if NO new traffic arrives on the key — the analog
    *   of the reference broker's redelivery delay (Key_Shared redelivers
    *   nacked messages after `negativeAckRedeliveryDelay` regardless of
    *   traffic). Implemented as a per-key processing-time timeout.
    *   Trade-off: with this timeout conf Spark schedules a micro-batch
    *   every trigger whether or not data arrived (so retries can fire),
    *   which also means `processAllAvailable()` no longer quiesces — pace
    *   the query with `Trigger.ProcessingTime` and observe the sink.
    *   `None` keeps the pure data-driven mode: a blocked key retries on
    *   its next arrival (and the engine stays fully idle between batches).
    */
  /** @param maxPending per-key bound on the blocked backlog (see
    *   [[DefaultMaxPending]]); overflowing messages are emitted with
    *   `status = "overflow"` (dead-letter) instead of buffered, newest
    *   first to overflow so the kept prefix preserves arrival order.
    */
  def run(input: Dataset[Msg], failsOn: (Msg, Int) => Boolean, maxAttempts: Int,
      retryBackoffMs: Option[Long] = None,
      maxPending: Int = DefaultMaxPending): Dataset[Out] = {
    val timeoutConf =
      if (retryBackoffMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    input
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: String, newMsgs: Iterator[Msg], state: GroupState[KeyState]) =>
          val st = state.getOption.getOrElse(KeyState(Nil, 0))
          // pending retries first, then new arrivals in seq order
          val queue = st.pending ++ newMsgs.toList.sortBy(_.seq)
          var attempts = st.headAttempts
          val out = List.newBuilder[Out]
          var remaining = queue
          var blocked = false
          while (remaining.nonEmpty && !blocked) {
            val m = remaining.head
            if (failsOn(m, attempts)) {
              attempts += 1
              if (attempts >= maxAttempts) {
                // dead-letter: emit with status=dead, unblock the key
                out += Out(m.key, m.seq, m.name, m.numPublishes, attempts, "dead")
                remaining = remaining.tail
                attempts = 0
              } else {
                blocked = true // no overtaking: stop the key here
              }
            } else {
              out += Out(m.key, m.seq, m.name, m.numPublishes + 1, attempts + 1,
                "success")
              remaining = remaining.tail
              attempts = 0
            }
          }
          if (remaining.isEmpty) state.remove()
          else {
            // bound the blocked backlog: everything past maxPending
            // overflows to the dead-letter path instead of state — a
            // never-succeeding key can then never grow state beyond the cap
            val (kept, overflow) = remaining.splitAt(maxPending)
            overflow.foreach { m =>
              out += Out(m.key, m.seq, m.name, m.numPublishes, 0, "overflow")
            }
            state.update(KeyState(kept, attempts))
            // blocked: schedule a retry even if the key sees no new traffic
            retryBackoffMs.foreach(state.setTimeoutDuration)
          }
          out.result().iterator
      }
  }
}
