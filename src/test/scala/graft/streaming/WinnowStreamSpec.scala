package graft.streaming

import graft.SparkTestSession
import graft.operators.Dedup
import graft.sources.WinnowStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The winnowing dedup-on-ingest front door: index-build mode must
  * reproduce the gated batch q213 bit-exactly through the checkpointed
  * foreachBatch path, and dedup mode must withhold exactly the probed
  * near-copies while their sources stay served.
  */
class WinnowStreamSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("index-build mode (never withhold): streamed store pairs ≡ gated q213") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val store = WinnowStore.build(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      s"wstream${System.nanoTime()}")
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft-ws-ckpt-").toString
    val src = Sources.queue[(Long, String)](spark)
    val query = WinnowStream.startIncremental(
      spark, src.toDS().toDF("doc_id", "text"), store, ckpt,
      onBatch = _ => (), dropShared = Long.MaxValue, compactEvery = 2)
    try {
      docs.grouped(120).foreach { g =>
        src.addData(g.toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    val got = WinnowStore.pairs(spark, store).collect()
      .map(_.toString).sorted.toSeq
    val want = Dedup.qWinnowPairs.build(spark, dir).collect()
      .map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == want)
  }

  test("dedup mode: near-copies are flagged and withheld, sources stay stored") {
    import spark.implicits._
    val base = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).take(50)
    val store = WinnowStore.build(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      s"wdedup${System.nanoTime()}")
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft-ws-ckpt-").toString
    var flagged = Vector.empty[(Long, Long)]
    var kept = Vector.empty[Long]
    val src = Sources.queue[(Long, String)](spark)
    val query = WinnowStream.startIncremental(
      spark, src.toDS().toDF("doc_id", "text"), store, ckpt,
      onBatch = b => kept ++= b.collect().map(_.getLong(0)),
      onFlagged = f =>
        flagged ++= f.collect().map(r => (r.getLong(0), r.getLong(1))))
    try {
      // batch 1: originals; batch 2: two near-copies + one fresh doc
      src.addData(base.toSeq)
      query.processAllAvailable()
      val copies = Seq(
        (700001L, base(0)._2 + " trailing addition"),
        (700002L, base(1)._2),
        (700003L, (0 until 40).map(i => s"novel$i").mkString(" ")))
      src.addData(copies)
      query.processAllAvailable()
    } finally query.stop()

    val flaggedIds = flagged.map(_._1).toSet
    assert(flaggedIds == Set(700001L, 700002L),
      s"near-copies must be withheld, got $flaggedIds")
    assert(flagged.forall { case (_, dupOf) => dupOf <= base.last._1 },
      "every verdict must point at an already-stored source")
    val stored = spark.table(store.fp).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!stored.contains(700001L) && !stored.contains(700002L))
    assert(stored.contains(700003L), "the fresh doc must be appended")
    assert(kept.contains(700003L) && !kept.exists(flaggedIds))
  }
}
