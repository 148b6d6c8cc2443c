package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CurationStreamSpec extends AnyFunSuite with SparkTestSession {

  test("streaming curation: cross-batch exact dedup + quality filter") {
    import spark.implicits._
    val src = Sources.queue[(Long, Timestamp, String, Long)](spark)
    val name = s"cur_${System.nanoTime()}"
    val good = "content words " * 20 // 280 chars, no stopwords
    val stopy = "the a an and or of to in is " * 10 // stopword-only
    val query = CurationStream.curate(
        src.toDS().toDF("doc_id", "ts", "text", "n_chars")
          .withColumn("n_chars",
            org.apache.spark.sql.functions.length(
              org.apache.spark.sql.functions.col("text"))))
      .writeStream.format("memory").outputMode("append").queryName(name).start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
      // batch 1: a good doc, an in-batch duplicate of it, a stopword-heavy
      // doc, and a too-short doc
      src.addData(Seq(
        (1L, t(0), good, 0L), (2L, t(1), good, 0L),
        (3L, t(1), stopy, 0L), (4L, t(2), "too short", 0L)))
      query.processAllAvailable()
      // batch 2: a cross-batch duplicate and a second distinct good doc
      src.addData(Seq(
        (5L, t(3), good, 0L), (6L, t(4), good + "extra tail", 0L)))
      query.processAllAvailable()
      val ids = spark.table(name).select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 6L),
        s"expected first copy + distinct doc only, got $ids")
    } finally query.stop()
  }
}
