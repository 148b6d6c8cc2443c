package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class StreamJoinSpec extends AnyFunSuite with SparkTestSession {

  test("interval join matches only pairs inside the time bound, across batches") {
    import spark.implicits._
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

    val clicks = Sources.queue[(Long, Timestamp, String)](spark)
    val views = Sources.queue[(Long, Timestamp, String)](spark)
    val joined = StreamJoin.interval(
      clicks.toDS().toDF("user_id", "click_ts", "click_id"), "click_ts",
      views.toDS().toDF("v_user_id", "view_ts", "view_id"), "view_ts",
      keyEquality = "user_id = v_user_id",
      watermarkDelay = "10 minutes",
      before = "5 MINUTES", after = "0 MINUTES")
    val name = s"sjoin_${System.nanoTime()}"
    val query = joined.writeStream.format("memory")
      .outputMode("append").queryName(name).start()
    try {
      // batch 1: views land first
      views.addData((1L, t(0), "v1"), (1L, t(20), "v2"), (2L, t(1), "v3"))
      query.processAllAvailable()
      // batch 2: clicks arrive later — cross-batch matching via state
      clicks.addData((1L, t(3), "c1"), (1L, t(21), "c2"), (2L, t(30), "c3"))
      query.processAllAvailable()
      val got = spark.table(name)
        .select("click_id", "view_id").as[(String, String)].collect().toSet
      // c1 matches v1 (3 min before); c2 matches v2 (1 min); c3 matches
      // nothing (v3 is 29 min earlier, outside the 5-min window);
      // v2 is NOT matched by c1 (17 min in the future)
      assert(got == Set(("c1", "v1"), ("c2", "v2")))
    } finally query.stop()
  }
}
