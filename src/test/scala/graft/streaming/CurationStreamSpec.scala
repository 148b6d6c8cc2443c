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

  test("incremental near-dup: late twins are flagged via the persisted store") {
    import spark.implicits._
    import graft.sources.SignatureStore
    def text(prefix: String) = (0 until 40).map(w => s"$prefix$w").mkString(" ")

    // day-0 corpus: one document, signed into the persisted store
    val t1 = text("alpha")
    val store = SignatureStore.build(spark,
      Seq((1L, t1)).toDF("doc_id", "text"), s"inc${System.nanoTime()}")

    val src = Sources.queue[(Long, Timestamp, String, Long)](spark)
    val curated = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val flagged = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-inc-ckpt-").toString
    val query = CurationStream.startIncremental(
      spark,
      src.toDS().toDF("doc_id", "ts", "text", "n_chars")
        .withColumn("n_chars", org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text"))),
      store, ckpt,
      onBatch = b => b.select("doc_id").as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect().foreach(curated.add),
      onFlagged = f => f.select("doc_id", "dup_of").collect()
        .foreach(r => flagged.add((r.getLong(0), r.getLong(1)))))
    try {
      def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
      val t2 = text("bravo")
      // batch 1: a near-dup of the DAY-0 corpus doc (one appended word —
      // not an exact dup, so the in-stream exact dedup passes it), plus a
      // genuinely new doc
      src.addData(Seq((100L, t(0), t1 + " tail", 0L), (101L, t(1), t2, 0L)))
      query.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(flagged.asScala.toSet == Set((100L, 1L)),
        s"the late twin of the stored corpus doc must be flagged: $flagged")
      assert(curated.asScala.toSet == Set(101L))

      // batch 2: a near-dup of doc 101 — which was never in the day-0
      // corpus; catching it proves the per-batch UPSERT, not the build
      src.addData(Seq((200L, t(2), t2 + " tail", 0L)))
      query.processAllAvailable()
      assert(flagged.asScala.toSet == Set((100L, 1L), (200L, 101L)),
        s"a twin of a previously STREAMED doc must be flagged: $flagged")
      assert(curated.asScala.toSet == Set(101L))
    } finally query.stop()
  }

  test("in-stream compaction keeps flagging twins across the rename swap") {
    import spark.implicits._
    import graft.sources.SignatureStore
    def text(prefix: String) = (0 until 40).map(w => s"$prefix$w").mkString(" ")
    val store = SignatureStore.build(spark,
      Seq((1L, text("seed"))).toDF("doc_id", "text"), s"cmp${System.nanoTime()}")
    val src = Sources.queue[(Long, Timestamp, String, Long)](spark)
    val flagged = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cmp-ckpt-").toString
    val query = CurationStream.startIncremental(
      spark,
      src.toDS().toDF("doc_id", "ts", "text", "n_chars")
        .withColumn("n_chars", org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text"))),
      store, ckpt,
      onBatch = _ => (),
      onFlagged = f => f.select("doc_id", "dup_of").collect()
        .foreach(r => flagged.add((r.getLong(0), r.getLong(1)))),
      compactEvery = 1) // compact before every batch after the first
    try {
      def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
      // three batches, each appending a new doc; batches 2 and 3 run
      // AFTER a compaction rename-swap and must still probe/append fine
      src.addData(Seq((10L, t(0), text("one"), 0L)))
      query.processAllAvailable()
      src.addData(Seq((11L, t(1), text("two"), 0L)))
      query.processAllAvailable()
      // twin of a doc streamed BEFORE a compaction: the swapped store
      // must still hold its signatures
      src.addData(Seq((12L, t(2), text("one") + " tail", 0L)))
      query.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(flagged.asScala.toSet == Set((12L, 10L)),
        s"twin must be flagged through the compacted store: $flagged")
    } finally query.stop()
  }
}
