package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DedupStageSpec extends AnyFunSuite with SparkTestSession {

  test("duplicates within the watermark horizon are dropped across batches") {
    import spark.implicits._
    val src = Sources.queue[(String, Timestamp, Int)](spark)
    val name = s"dedup_${System.nanoTime()}"
    val deduped = DedupStage.withinWatermark(
      src.toDS().toDF("key", "ts", "v"), "ts", "10 minutes", Seq("key"))
    val query = deduped.writeStream.format("memory")
      .outputMode("append").queryName(name).start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
      // batch 1: k1 twice (in-batch dup), k2 once
      src.addData(("k1", t(0), 1), ("k1", t(1), 2), ("k2", t(1), 3))
      query.processAllAvailable()
      // batch 2: k1 again (cross-batch dup within horizon), k3 new
      src.addData(("k1", t(2), 4), ("k3", t(2), 5))
      query.processAllAvailable()
      val keys = spark.table(name).select("key").as[String].collect().sorted
      assert(keys.toSeq == Seq("k1", "k2", "k3"),
        s"expected exactly-once per key, got ${keys.mkString(",")}")
    } finally query.stop()
  }
}
