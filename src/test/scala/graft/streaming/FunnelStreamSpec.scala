package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class FunnelStreamSpec extends AnyFunSuite with SparkTestSession {

  private def t(min: Int) = Timestamp.valueOf(f"2026-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("a funnel completing across batches emits exactly one completion") {
    import spark.implicits._
    val src = Sources.queue[(Long, String, Timestamp)](spark)
    val name = s"funnel_${System.nanoTime()}"
    val query = FunnelStream.completions(
        src.toDS().toDF("user_id", "event_type", "ts"))
      .writeStream.format("memory").outputMode("append").queryName(name).start()
    try {
      // batch 1: u1 view+click (funnel armed), u2 view only, u3 purchase
      // with no prior stages (no-op)
      src.addData(Seq((1L, "view", t(0)), (1L, "click", t(1)),
        (2L, "view", t(1)), (3L, "purchase", t(1))))
      query.processAllAvailable()
      assert(spark.table(name).count() == 0, "no funnel is complete yet")

      // batch 2: u1 purchases -> completion with the original stage times;
      // u2 clicks but never purchases
      src.addData(Seq((1L, "purchase", t(5)), (2L, "click", t(5))))
      query.processAllAvailable()
      val rows = spark.table(name)
        .select("user_id", "view_tus", "click_tus", "purchase_tus")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(rows.map(_._1) == Seq(1L), s"only u1 completed: $rows")
      val (_, v, c, p) = rows.head
      assert(v < c && c < p, "stage timestamps must be strictly ordered")

      // out-of-stage-order events inside one batch still complete (the
      // handler sorts by event time): u4 arrives as purchase/click/view
      // in one batch but with view < click < purchase event times
      src.addData(Seq((4L, "purchase", t(8)), (4L, "click", t(7)),
        (4L, "view", t(6))))
      query.processAllAvailable()
      assert(spark.table(name).select("user_id").as[Long].collect().toSet
        == Set(1L, 4L))
    } finally query.stop()
  }

  test("an abandoned partial funnel is forgotten after the TTL (bounded state)") {
    import spark.implicits._
    val src = Sources.queue[(Long, String, Timestamp)](spark)
    val name = s"funnel_ttl_${System.nanoTime()}"
    // tight horizon: 1-minute lateness, 2-minute TTL
    val query = FunnelStream.completions(
        src.toDS().toDF("user_id", "event_type", "ts"),
        watermarkDelay = "1 minute", ttlMs = 2 * 60 * 1000L)
      .writeStream.format("memory").outputMode("append").queryName(name).start()
    try {
      // u9 views at t0, then goes idle
      src.addData(Seq((9L, "view", t(0))))
      query.processAllAvailable()
      // other traffic pushes the watermark far past t0 + TTL, expiring
      // u9's partial funnel
      src.addData(Seq((8L, "view", t(30))))
      query.processAllAvailable()
      // u9 returns with click+purchase (fresh, in-watermark events) —
      // but the view stage was forgotten, so NO completion fires
      src.addData(Seq((9L, "click", t(31)), (9L, "purchase", t(32))))
      query.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "expired state must not complete a funnel")
      // a fresh full pass for u9 works again
      src.addData(Seq((9L, "view", t(33)), (9L, "click", t(34)),
        (9L, "purchase", t(35))))
      query.processAllAvailable()
      assert(spark.table(name).select("user_id").as[Long].collect().toSeq
        == Seq(9L))
    } finally query.stop()
  }

  test("a stage-irrelevant event after the TTL horizon must not kill the query") {
    import spark.implicits._
    // With no-data micro-batches disabled (a common latency config) the
    // engine never runs the timeout-only batch after a watermark jump, so
    // an idle user's state survives with its timeout already BEHIND the
    // watermark; when that user returns with a stage-irrelevant event the
    // in-batch data suppresses hasTimedOut and the handler re-sets a
    // timeout derived from the stale stage time — without the watermark
    // clamp Spark rejects the behind-watermark timestamp and the query
    // dies.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val src = Sources.queue[(Long, String, Timestamp)](spark)
      val name = s"funnel_stale_${System.nanoTime()}"
      val query = FunnelStream.completions(
          src.toDS().toDF("user_id", "event_type", "ts"),
          watermarkDelay = "1 minute", ttlMs = 2 * 60 * 1000L)
        .writeStream.format("memory").outputMode("append").queryName(name).start()
      try {
        // u7 views at t0, then goes idle at stage 1
        src.addData(Seq((7L, "view", t(0))))
        query.processAllAvailable()
        // other traffic pushes the watermark far past u7's t0+TTL timeout;
        // no timeout-only batch runs, so u7's state stays live
        src.addData(Seq((6L, "view", t(30))))
        query.processAllAvailable()
        // u7 returns with a REPEAT view (stage-irrelevant at stage 1)
        src.addData(Seq((7L, "view", t(31))))
        query.processAllAvailable()
        assert(query.isActive, "stale-timeout event must not kill the query")
        assert(spark.table(name).count() == 0)
        // the stream is still fully functional afterwards
        src.addData(Seq((5L, "view", t(32)), (5L, "click", t(33)),
          (5L, "purchase", t(34))))
        query.processAllAvailable()
        assert(spark.table(name).select("user_id").as[Long].collect().toSeq
          == Seq(5L))
      } finally query.stop()
    } finally
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
  }
}
