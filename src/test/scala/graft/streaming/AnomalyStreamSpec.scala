package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stream≡batch equivalence of the anomaly front door: after
  * streaming a corpus of events through [[AnomalyStream]] in several
  * micro-batches (with in-stream compaction), the served EWMA anomaly
  * board is bit-identical to the gated q214 over the same events, and a
  * replayed batch folds nothing twice (additive counts — the guard is
  * correctness, not bookkeeping).
  */
class AnomalyStreamSpec extends AnyFunSuite with SparkTestSession {
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  test("streamed count store serves q214's batch board bit-exactly") {
    import spark.implicits._
    val events = graft.Tables.load(spark, dir, "events")
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
    val store = AnomalyStream.build(spark, "spec")
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft-as-ckpt-").toString
    var lastReport: Array[org.apache.spark.sql.Row] = Array.empty

    val src = Sources.queue[(String, java.sql.Timestamp)](spark)
    val query = AnomalyStream.startIncremental(
      spark, src.toDS().toDF("event_type", "ts"),
      store, ckpt,
      onBatch = r => lastReport = r.collect(),
      compactEvery = 2)
    try {
      events.grouped((events.length + 3) / 4).foreach { g =>
        src.addData(g.toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    val served = AnomalyStream.serve(spark, store)
      .collect().map(key).sorted.toSeq
    val batch = graft.operators.Temporal.qEwmaAnomaly
      .build(spark, dir).collect().map(key).sorted.toSeq
    assert(served.nonEmpty && served == batch)

    // the final in-stream report (minus batch_id) sees what serve sees
    val repKeys = lastReport.map(r =>
      (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).sorted.toSeq
    assert(repKeys == batch)

    // replay idempotency: re-folding the LAST batch's grid (same
    // ckpt/batch_id tags) changes nothing — additive counts would
    // otherwise double and shift every EWMA state after the first dup
    val groups = events.grouped((events.length + 3) / 4).toSeq
    val rowsBefore = spark.table(store.table).count()
    val replay = AnomalyStream.batchGrid(
        groups.last.toSeq.toDF("event_type", "ts"))
      .select(lit(ckpt).as("ckpt"),
        lit((groups.size - 1).toLong).as("batch_id"),
        col("event_type"), col("day"), col("x"))
    AnomalyStream.append(spark, store, replay)
    assert(spark.table(store.table).count() == rowsBefore)
    assert(AnomalyStream.serve(spark, store)
      .collect().map(key).sorted.toSeq == batch)

    // full compaction leaves the served board unchanged
    AnomalyStream.compactRows(spark, store, ckpt)
    assert(AnomalyStream.serve(spark, store)
      .collect().map(key).sorted.toSeq == batch)

    // fresh-checkpoint restart: a NEW stream on the SAME store re-issues
    // batch_id 0 — the ckpt-scoped guard must fold it, not drop it (the
    // GraphStream fresh-checkpoint lesson, additive-state form)
    val ckpt2 =
      java.nio.file.Files.createTempDirectory("graft-as-ckpt2-").toString
    val src2 = Sources.queue[(String, java.sql.Timestamp)](spark)
    val extra = Seq(
      ("click", java.sql.Timestamp.valueOf("2025-06-01 12:00:00")),
      ("view", java.sql.Timestamp.valueOf("2025-06-02 12:00:00")))
    val q2 = AnomalyStream.startIncremental(
      spark, src2.toDS().toDF("event_type", "ts"), store, ckpt2,
      onBatch = _ => ())
    try {
      src2.addData(extra)
      q2.processAllAvailable()
    } finally q2.stop()
    val after = AnomalyStream.serve(spark, store)
      .collect().map(key).sorted.toSeq
    val batchAfter = graft.operators.Temporal.ewmaFromCounts(
        graft.operators.Temporal.eventDayCounts(
          (events.toSeq ++ extra).toDF("event_type", "ts")))
      .collect().map(key).sorted.toSeq
    assert(after == batchAfter,
      "a fresh-checkpoint restart must fold its batches, not drop them")
  }
}
