package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Executable version of the reference's part-5 ordering proofs
  * (part5/OrderedMessageProcessor.scala:66-79 asserts "≤1 in progress per
  * key" by log inspection; here the invariants are asserted on output):
  *  - per-key output order follows seq order (no overtaking), even when a
  *    message fails and is retried across micro-batches;
  *  - at-least-once: every message is eventually emitted exactly once
  *    (success or dead-letter), none lost;
  *  - numPublishes increments by exactly one hop per successful process.
  */
class OrderedProcessorSpec extends AnyFunSuite with SparkTestSession {
  import OrderedProcessor._

  private def runScenario(
      batches: Seq[Seq[Msg]],
      toFail: Set[(String, Long)],
      maxAttempts: Int = 5): Seq[Out] = {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Msg]
    val failsOn: (Msg, Int) => Boolean =
      (m, att) => att == 0 && toFail.contains((m.key, m.seq))
    val name = s"ordered_out_${System.nanoTime()}"
    val query = OrderedProcessor.run(input.toDS(), failsOn, maxAttempts)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      spark.table(name).as[Out].collect().toSeq
    } finally query.stop()
  }

  test("happy path: per-key order preserved, one hop per message") {
    val out = runScenario(
      Seq(Seq(
        Msg("k1", 0, "a", 0), Msg("k1", 1, "b", 0), Msg("k2", 0, "c", 5))),
      toFail = Set.empty)
    assert(out.map(o => (o.key, o.seq, o.numPublishes, o.status)).toSet == Set(
      ("k1", 0L, 1, "success"), ("k1", 1L, 1, "success"), ("k2", 0L, 6, "success")))
  }

  test("a failed message blocks its key: successors do not overtake") {
    // batch 1: k1/seq0 fails -> k1 fully blocked, k2 unaffected
    val batches = Seq(
      Seq(Msg("k1", 0, "a", 0), Msg("k1", 1, "b", 0), Msg("k2", 0, "c", 0)),
      Seq(Msg("k1", 2, "d", 0))) // next activation retries seq0 first
    val out = runScenario(batches, toFail = Set(("k1", 0L)))
    val k1 = out.filter(_.key == "k1").sortBy(_.seq)
    // all three k1 messages eventually processed, in seq order
    assert(k1.map(_.seq) == Seq(0L, 1L, 2L))
    assert(k1.map(_.status).forall(_ == "success"))
    // the retried head took 2 attempts; successors took 1
    assert(k1.map(_.attempts) == Seq(2, 1, 1))
    // ordering proof: seq 1 and 2 were not emitted before seq 0 —
    // all were emitted at-or-after the retry activation, so the memory
    // sink's row order per key is seq-ascending
    val k1Order = out.zipWithIndex.filter(_._1.key == "k1").map(_._2)
    assert(k1Order == k1Order.sorted)
  }

  test("at-least-once with bounded retries: exhausted head dead-letters and unblocks") {
    val batches = Seq(
      Seq(Msg("k1", 0, "a", 0), Msg("k1", 1, "b", 0)),
      Seq(Msg("k1", 2, "c", 0)), // activation 2: retry seq0 (attempt 1)
      Seq(Msg("k1", 3, "d", 0))) // activation 3: attempt 2 = maxAttempts -> dead
    val alwaysFail: (Msg, Int) => Boolean = (m, _) => m.seq == 0 && m.key == "k1"
    import graft.SparkTestSession
    // use runScenario's shape but with a custom failure fn
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Msg]
    val name = s"ordered_dead_${System.nanoTime()}"
    val query = OrderedProcessor.run(input.toDS(), alwaysFail, maxAttempts = 2)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      val out = spark.table(name).as[Out].collect().toSeq
      val bySeq = out.filter(_.key == "k1").sortBy(_.seq)
      assert(bySeq.map(o => (o.seq, o.status)) == Seq(
        (0L, "dead"), (1L, "success"), (2L, "success"), (3L, "success")))
      // exactly-once emission per message
      assert(out.groupBy(o => (o.key, o.seq)).values.forall(_.size == 1))
    } finally query.stop()
  }

  test("a nacked head retries via timeout even with NO new traffic on the key") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Msg]
    val failsOn: (Msg, Int) => Boolean = (m, att) => att == 0 && m.key == "k1"
    val name = s"ordered_timeout_${System.nanoTime()}"
    val query = OrderedProcessor
      .run(input.toDS(), failsOn, maxAttempts = 5, retryBackoffMs = Some(100L))
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      input.addData(Seq(Msg("k1", 0, "a", 0), Msg("k1", 1, "b", 0)))
      // NOTE: no processAllAvailable — with a processing-time timeout the
      // engine keeps scheduling batches, so quiescence never happens;
      // observe the sink instead. No further addData: only the timeout
      // can unblock k1.
      val deadline = System.currentTimeMillis() + 30000
      def rows() = spark.table(name).as[Out].collect().toSeq
      while (rows().size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val out = rows().sortBy(_.seq)
      // failsOn nacks the FIRST attempt of every k1 message, so each head
      // needs one timeout-driven retry: two timeout firings total, both
      // messages drained in seq order with attempts = 2
      assert(out.map(o => (o.seq, o.status, o.attempts)) ==
        Seq((0L, "success", 2), (1L, "success", 2)),
        s"timeout retry did not drain the blocked key: $out")
    } finally query.stop()
  }

  test("a blocked key's pending state is bounded; overflow dead-letters (status=overflow)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Msg]
    // head k1/seq0 fails its first two attempts, then succeeds — the key
    // stays blocked across two activations while traffic keeps arriving
    val failsOn: (Msg, Int) => Boolean =
      (m, att) => m.key == "k1" && m.seq == 0 && att < 2
    val name = s"ordered_overflow_${System.nanoTime()}"
    val query = OrderedProcessor
      .run(input.toDS(), failsOn, maxAttempts = 100, maxPending = 2)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // activation 1: head fails (attempt 1); backlog [0,1,2] caps at 2 →
      // seq 2 overflows immediately instead of growing state
      input.addData(Seq(Msg("k1", 0, "a", 0), Msg("k1", 1, "b", 0), Msg("k1", 2, "c", 0)))
      query.processAllAvailable()
      // activation 2: head fails again; arrivals 3,4 would grow the
      // buffer past the cap → both overflow
      input.addData(Seq(Msg("k1", 3, "d", 0), Msg("k1", 4, "e", 0)))
      query.processAllAvailable()
      // activation 3: head succeeds (attempt 3); kept backlog [0,1] drains
      // in order, new arrival 5 follows
      input.addData(Seq(Msg("k1", 5, "f", 0)))
      query.processAllAvailable()
      val out = spark.table(name).as[Out].collect().toSeq
      val byStatus = out.groupBy(_.status).view.mapValues(_.map(_.seq).sorted).toMap
      // the cap held: everything past 2 pending dead-lettered as overflow
      assert(byStatus("overflow") == Seq(2L, 3L, 4L), s"got $byStatus")
      // the KEPT prefix still processed in seq order, no overtaking
      assert(byStatus("success") == Seq(0L, 1L, 5L), s"got $byStatus")
      val successOrder = out.filter(_.status == "success").map(_.seq)
      assert(successOrder == successOrder.sorted)
      // exactly-once emission per message
      assert(out.groupBy(o => (o.key, o.seq)).values.forall(_.size == 1))
    } finally query.stop()
  }

  test("deterministic failure injection matches the declared rate shape") {
    // ~10% of first attempts fail; retries always succeed
    val fails = (0 until 1000).count(i =>
      deterministicFailure(10)(Msg("k", i.toLong, s"n$i", 0), 0))
    assert(fails > 50 && fails < 200, s"got $fails/1000")
    assert(!(0 until 1000).exists(i =>
      deterministicFailure(10)(Msg("k", i.toLong, s"n$i", 0), 1)))
  }
}
