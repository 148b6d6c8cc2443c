package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stream≡batch equivalence of the classifier-evaluation front
  * door: after streaming a corpus through [[EvalStream]] in several
  * micro-batches (with in-stream compaction), the served sliced
  * AUC/best-F1 report is bit-identical to the gated q208 over the same
  * corpus, and a replayed batch folds nothing twice (additive state —
  * the guard is correctness, not bookkeeping).
  */
class EvalStreamSpec extends AnyFunSuite with SparkTestSession {
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  test("streamed grid store serves q208's batch report bit-exactly") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._2)
    // FIXED tag: build()'s dropStale cleans the previous run's table
    val store = EvalStream.build(spark, "spec")
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft-es-ckpt-").toString
    var lastReport: Array[org.apache.spark.sql.Row] = Array.empty

    val src = Sources.queue[(String, Long, String)](spark)
    val query = EvalStream.startIncremental(
      spark,
      src.toDS().toDF("source", "doc_id", "text")
        .select(col("source"), col("text")),
      store, ckpt,
      onBatch = r => lastReport = r.collect(),
      compactEvery = 2)
    try {
      docs.grouped(120).foreach { g =>
        src.addData(g.toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    val served = EvalStream.serve(spark, store)
      .collect().map(key).sortBy(_._1)
    val batch = graft.operators.TextAnalysis.qClassifierEval
      .build(spark, dir).collect().map(key).sortBy(_._1)
    assert(served.length == batch.length && served.sameElements(batch))

    // the final in-stream report (minus its batch_id column) must be
    // the same rows — the callback sees exactly what serve() sees
    val repKeys = lastReport.map(r =>
      (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).sortBy(_._1)
    assert(repKeys.sameElements(batch))

    // replay idempotency: re-folding an already-folded batch's grid
    // (same ckpt/batch_id tags) changes nothing — additive state would
    // otherwise double-count. The LAST batch is the replayable one
    // (compaction collapses older tags precisely because the engine can
    // no longer redeliver them)
    val groups = docs.grouped(120).toSeq
    val rowsBefore = spark.table(store.table).count()
    val replay = EvalStream.batchGrid(
        groups.last.toSeq.toDF("source", "doc_id", "text")
          .select(col("source"), col("text")))
      .select(lit(ckpt).as("ckpt"), lit((groups.size - 1).toLong)
        .as("batch_id"), col("source"), col("score"), col("p"), col("n"))
    EvalStream.append(spark, store, replay)
    assert(spark.table(store.table).count() == rowsBefore)
    val served2 = EvalStream.serve(spark, store)
      .collect().map(key).sortBy(_._1)
    assert(served2.sameElements(batch))

    // the SAME store serves the q212 fairness board: per-source (n, k)
    // derive from the grid cells (kept at θ=0 ⇔ score ≥ 0). Exact
    // equality with the gated q212 holds on any corpus without
    // zero-word docs (the grid's labeled universe) — assert the
    // precondition so a testdata regeneration fails loudly here.
    val nZeroWord = graft.Tables.load(spark, dir, "documents")
      .filter(graft.TextMetrics.wordCount(col("text")) === 0L).count()
    assert(nZeroWord == 0L,
      "universe precondition: every doc is scoreable (word count > 0)")
    val bias = EvalStream.serveBias(spark, store)
      .collect().map(_.toString).sorted
    val biasBatch = graft.operators.TextAnalysis.qSourceBias
      .build(spark, dir).collect().map(_.toString).sorted
    assert(bias.sameElements(biasBatch))

    // fresh-checkpoint restart: a NEW stream on the SAME store re-issues
    // batch_id 0 — the ckpt-scoped guard must fold it, not drop it (the
    // GraphStream fresh-checkpoint lesson, additive-state form)
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("graft-es-ckpt2-").toString
    val src2 = Sources.queue[(String, Long, String)](spark)
    val extra = Seq(
      ("srcX", 900001L, "the and of to in words keep arriving here"),
      ("srcX", 900002L, "zz qq xx plainly unstoppable writing sample"))
    val q2 = EvalStream.startIncremental(
      spark, src2.toDS().toDF("source", "doc_id", "text")
        .select(col("source"), col("text")),
      store, ckpt2, onBatch = _ => ())
    try {
      src2.addData(extra)
      q2.processAllAvailable()
    } finally q2.stop()
    val after = EvalStream.serve(spark, store)
      .collect().map(key).sortBy(_._1)
    val batchAfter = graft.operators.TextAnalysis.evalFromGrid(
        EvalStream.batchGrid(
          (docs.toSeq ++ extra.map(e => (e._1, e._2, e._3)))
            .toDF("source", "doc_id", "text")
            .select(col("source"), col("text"))))
      .collect().map(key).sortBy(_._1)
    assert(after.sameElements(batchAfter),
      "a fresh-checkpoint restart must fold its batches, not drop them")
  }
}
