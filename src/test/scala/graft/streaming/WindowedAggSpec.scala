package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming tumbling-window aggregation equals its batch twin on the
  * same rows once the watermark closes the windows (SURVEY §2C Q20's
  * streaming form).
  */
case class Ev(ts: Timestamp, event_type: String, value: Double)

class WindowedAggSpec extends AnyFunSuite with SparkTestSession {

  private def t(s: String) = Timestamp.valueOf(s)

  test("closed windows match the batch computation; late data past watermark dropped") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"win_${System.nanoTime()}"
    val query = WindowedAgg.tumbling(input.toDF(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val hour1 = Seq(
        Ev(t("2024-01-01 10:05:00"), "click", 1.5),
        Ev(t("2024-01-01 10:15:00"), "click", 2.5),
        Ev(t("2024-01-01 10:55:00"), "view", 4.0))
      input.addData(hour1); query.processAllAvailable()
      // advance event time into hour 12 => watermark passes hour-10 and
      // hour-11 window ends; hour-10 results emit
      input.addData(Seq(Ev(t("2024-01-01 12:01:00"), "view", 1.0)))
      query.processAllAvailable()
      // one more batch so the new watermark takes effect on emission
      input.addData(Seq(Ev(t("2024-01-01 12:02:00"), "view", 1.0)))
      query.processAllAvailable()

      val emitted = spark.table(name)
        .select("window_start", "event_type", "cnt", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val expected = hour1.toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          graft.functions.Exact.dsum(col("value")).as("sum_value"))
        .select(col("window.start"), col("event_type"), col("cnt"), col("sum_value"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(emitted == expected,
        s"emitted $emitted\nexpected $expected")

      // late arrival for the already-closed hour-10 window is dropped
      input.addData(Seq(Ev(t("2024-01-01 10:30:00"), "click", 9.9)))
      query.processAllAvailable()
      val after = spark.table(name)
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(after == emitted, "late data must not reopen a closed window")
    } finally query.stop()
  }

  test("streaming sessionization: gap splits sessions, matches batch q38 semantics") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val name = s"sess_${System.nanoTime()}"
    val query = WindowedAgg.sessionized(
        input.toDS().toDF("ts", "user_id"),
        gap = "30 minutes", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min gap
      // (new session); user 2: one event
      input.addData(Seq(
        (t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:10:00"), 1L),
        (t("2024-01-01 10:50:00"), 1L), (t("2024-01-01 10:05:00"), 2L)))
      query.processAllAvailable()
      // push the watermark far past every session end + gap to flush
      input.addData(Seq((t("2024-01-01 14:00:00"), 99L)))
      query.processAllAvailable()
      input.addData(Seq((t("2024-01-01 15:00:00"), 99L)))
      query.processAllAvailable()

      val got = spark.table(name)
        .select("user_id", "session_start", "n_events")
        .as[(Long, Timestamp, Long)].collect()
        .filter(_._1 != 99L).toSet
      assert(got == Set(
        (1L, t("2024-01-01 10:00:00"), 2L),
        (1L, t("2024-01-01 10:50:00"), 1L),
        (2L, t("2024-01-01 10:05:00"), 1L)),
        s"got $got")
    } finally query.stop()
  }

  test("streaming per-window top-k ranks each closed window (batch q55 twin)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Timestamp, Long, String, Long)]()
    val query = WindowedAgg.topKPerWindow(input.toDF(), k = 2,
      watermarkDelay = "0 seconds") { ranked =>
      ranked.select("window_start", "rk", "event_type", "cnt")
        .as[(Timestamp, Long, String, Long)](
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.TIMESTAMP,
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.STRING,
            org.apache.spark.sql.Encoders.scalaLong))
        .collect().foreach(got.add)
    }
    try {
      // hour-10 window: click×3, view×2, buy×1 — top-2 = click, view
      input.addData(Seq(
        Ev(t("2024-01-01 10:01:00"), "click", 1), Ev(t("2024-01-01 10:02:00"), "click", 1),
        Ev(t("2024-01-01 10:03:00"), "click", 1), Ev(t("2024-01-01 10:04:00"), "view", 1),
        Ev(t("2024-01-01 10:05:00"), "view", 1), Ev(t("2024-01-01 10:06:00"), "buy", 1)))
      query.processAllAvailable()
      // advance the watermark to close hour 10
      input.addData(Seq(Ev(t("2024-01-01 12:01:00"), "view", 1)))
      query.processAllAvailable()
      input.addData(Seq(Ev(t("2024-01-01 12:02:00"), "view", 1)))
      query.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val hour10 = got.asScala.filter(_._1 == t("2024-01-01 10:00:00")).toSet
      assert(hour10 == Set(
        (t("2024-01-01 10:00:00"), 1L, "click", 3L),
        (t("2024-01-01 10:00:00"), 2L, "view", 2L)),
        s"top-2 of the closed hour-10 window: $hour10")
    } finally query.stop()
  }
}
