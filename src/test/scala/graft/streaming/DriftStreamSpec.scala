package graft.streaming

import graft.SparkTestSession
import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stream≡batch equivalence of the drift-monitor front door:
  * every per-batch W₁ report equals the gated q149 math over exactly the
  * documents ingested so far, the persisted histogram equals the batch
  * histogram of the full corpus, and a replayed batch folds nothing
  * twice.
  */
class DriftStreamSpec extends AnyFunSuite with SparkTestSession {
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  private def w1Of(docs: Seq[(Long, String, String)]): Seq[(String, Long, Long)] = {
    import spark.implicits._
    TextAnalysis.wassersteinBySource(
        TextAnalysis.lengthHist(docs.toDF("doc_id", "source", "text")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
  }

  test("per-batch W1 reports ≡ the gated q149 math over the ingested prefix") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    // FIXED tag: build()'s dropStale cleans the previous sbt run's table
    val store = DriftStream.build(spark, "spec")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ds-ckpt-").toString
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, Long, Long)]()

    val src = Sources.queue[(Long, String, String)](spark)
    val query = DriftStream.startIncremental(
      spark, src.toDS().toDF("doc_id", "source", "text"), store, ckpt,
      onBatch = r => r.collect().foreach(row => reports.add(
        (row.getLong(0), row.getString(1), row.getLong(2), row.getLong(3)))),
      compactEvery = 2)
    val batches = docs.grouped(170).toSeq
    try {
      batches.foreach { g =>
        src.addData(g.toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    // every batch's report == the batch metric over the prefix seen then
    val byBatch = reports.toArray(Array.empty[(Long, String, Long, Long)])
      .groupBy(_._1)
    assert(byBatch.keySet == batches.indices.map(_.toLong).toSet)
    batches.indices.foreach { k =>
      val got = byBatch(k.toLong).map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq
      assert(got == w1Of(batches.take(k + 1).flatten),
        s"batch $k report diverged from the gated metric over its prefix")
    }

    // persisted histogram == batch histogram of the full corpus
    val stored = DriftStream.histogram(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val batchHist = TextAnalysis.lengthHist(docs.toSeq.toDF("doc_id", "source", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(stored == batchHist)

    // final report == gated metric over everything (and over the store)
    val fin = DriftStream.report(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(fin == w1Of(docs.toSeq))

    // in-stream compactRows (compactEvery = 2) collapsed all but the
    // latest fold: store rows are bounded by |hist| + |latest batch|
    // bound: baseline (≤ |hist|) + the two row-sets folded since the
    // batch-2 compaction hook (each ≤ its batch's cell count ≤ |hist|)
    val storeRows = spark.table(store.table).count()
    assert(storeRows <= 3L * batchHist.size,
      s"row-collapsing compaction must bound the store ($storeRows rows)")

    // replay idempotency: re-folding the LATEST (ckpt, batch_id) — the
    // only batch Structured Streaming can ever re-deliver — changes
    // nothing (additive state guarded by batch accounting; earlier
    // batch ids are committed and unreplayable, which is what licenses
    // compactRows collapsing them)
    val lastBid = (batches.size - 1).toLong
    DriftStream.append(spark, store,
      TextAnalysis.lengthHist(batches.last.toSeq.toDF("doc_id", "source", "text"))
        .select(lit(ckpt).as("ckpt"), lit(lastBid).as("batch_id"),
          col("source"), col("w"), col("o")))
    val stored2 = DriftStream.histogram(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(stored2 == batchHist, "replayed batch must fold nothing")

    // explicit compactRows: histogram identical before/after, and a
    // replay of the latest batch STILL folds nothing afterwards
    DriftStream.compactRows(spark, store, ckpt)
    assert(DriftStream.histogram(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      == batchHist, "compaction must preserve the histogram")
    DriftStream.append(spark, store,
      TextAnalysis.lengthHist(batches.last.toSeq.toDF("doc_id", "source", "text"))
        .select(lit(ckpt).as("ckpt"), lit(lastBid).as("batch_id"),
          col("source"), col("w"), col("o")))
    assert(DriftStream.histogram(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      == batchHist, "replay after compaction must fold nothing")

    // fresh-checkpoint restart: a NEW stream on the SAME store re-issues
    // batch_id 0 — the ckpt-scoped guard must fold it, not drop it (the
    // GraphStream fresh-checkpoint lesson, additive-state form)
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-ds-ckpt2-").toString
    val src2 = Sources.queue[(Long, String, String)](spark)
    val extra = Seq((100000L, "srcX", "brand new words arriving after restart"))
    val q2 = DriftStream.startIncremental(
      spark, src2.toDS().toDF("doc_id", "source", "text"), store, ckpt2,
      onBatch = _ => ())
    try {
      src2.addData(extra)
      q2.processAllAvailable()
    } finally q2.stop()
    val stored3 = DriftStream.histogram(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(stored3 == TextAnalysis.lengthHist(
        (docs.toSeq ++ extra).toDF("doc_id", "source", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq,
      "a fresh-checkpoint restart must fold its batches, not drop them")
  }
}
