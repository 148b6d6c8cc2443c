package graft.streaming

import graft.SparkTestSession
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming substring-dedup front door:
  *
  *  1. Stream ≡ batch — ingesting the corpus in doc_id order (the
  *     arrival-order keeper rule then coincides with batch q130's
  *     lowest-doc_id rule) with the df cap off reproduces
  *     `Dedup.substringRemove` BIT-EXACTLY, regardless of how the
  *     stream was chunked into batches (cross-store and in-batch match
  *     surfaces compose to exactly the batch pair set).
  *  2. Replay is a no-op: re-delivered docs clean nothing, append
  *     nothing.
  *  3. First-arrival semantics: out of id order, the EARLIER arrival
  *     keeps the passage even with the higher doc_id.
  */
class CleanStreamSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[(Long, Long, Long, String)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq.sorted

  test("in-order stream ≡ batch substringRemove bit-exactly; replay no-op") {
    import spark.implicits._
    val docsDf = graft.Tables.load(spark, dir, "documents")
    val docs = docsDf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val store = CleanStream.build(spark, "spec")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cl-ckpt-").toString
    val out = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long, String)]()

    val src = Sources.queue[(Long, String)](spark)
    val query = CleanStream.startIncremental(
      spark, src.toDS().toDF("doc_id", "text"), store, minWords = 8, ckpt,
      onBatch = b => rows(b).foreach(out.add), compactEvery = 2)
    try {
      docs.grouped(150).foreach { g =>
        src.addData(g.toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    val streamed = out.toArray(Array.empty[(Long, Long, Long, String)]).toSeq.sorted
    val batch = rows(Dedup.substringRemove(docsDf, 8, Long.MaxValue))
    assert(streamed.size == docs.length, "one cleaned row per document")
    assert(streamed == batch, "streamed clean diverged from batch q130 (cap off)")

    // replay: already-manifested docs produce nothing and append nothing
    val before = spark.table(store.posTable).count()
    val replayed = CleanStream.cleanAndIngest(
      spark, store, docs.take(3).toSeq.toDF("doc_id", "text"), minWords = 8)
    assert(replayed.isEmpty, "replayed docs must clean nothing")
    assert(spark.table(store.posTable).count() == before,
      "replayed docs appended span rows")
  }

  test("crash window (spans committed, manifest not) replays to the first attempt's clean") {
    import spark.implicits._
    val p = "one two three four five six seven eight nine ten"
    val batch = Seq((5L, p), (10L, p))
    // reference: the same batch through an un-crashed store — in-batch
    // keeper is the lower doc_id
    val ref = CleanStream.build(spark, "specref")
    val expected = rows(CleanStream.cleanAndIngest(
      spark, ref, batch.toDF("doc_id", "text"), minWords = 8))
    assert(expected == Seq((5L, 10L, 0L, p), (10L, 10L, 10L, "")),
      "sanity: the lower doc_id keeps the in-batch passage")

    // crashed store: a prior attempt appended the batch's spans but
    // died before the manifest commit — the replay must not let the
    // batch's own stored spans emit BOTH pair orientations (which
    // would splice the keeper too)
    val store = CleanStream.build(spark, "speccrash")
    Dedup.spanPosRows(batch.toDF("doc_id", "text"))
      .write.bucketBy(CleanStream.Buckets, "h").sortBy("h")
      .mode("append").saveAsTable(store.posTable)
    spark.catalog.refreshTable(store.posTable)
    val replayed = rows(CleanStream.cleanAndIngest(
      spark, store, batch.toDF("doc_id", "text"), minWords = 8))
    assert(replayed == expected,
      "crash-window replay diverged — the keeper lost its passage")
    // the window's duplicate span rows heal at compact
    CleanStream.compact(spark, store)
    assert(spark.table(store.posTable).count() ==
      spark.table(ref.posTable).count(),
      "compact must collapse the crash window's duplicate span rows")
  }

  test("pre-compaction duplicate stored spans do not fragment removal extents") {
    import spark.implicits._
    val p = "aa bb cc dd ee ff gg hh ii jj"
    val store = CleanStream.build(spark, "specdup")
    CleanStream.cleanAndIngest(spark, store,
      Seq((1L, p)).toDF("doc_id", "text"), minWords = 10)
    // crash-window double append for the ALREADY-MANIFESTED doc:
    // without the distinct() on the stored probe side, the duplicated
    // match rows split the row_number islands and the 10-word extent
    // falls below minWords — the copy silently keeps the passage
    Dedup.spanPosRows(Seq((1L, p)).toDF("doc_id", "text"))
      .write.bucketBy(CleanStream.Buckets, "h").sortBy("h")
      .mode("append").saveAsTable(store.posTable)
    spark.catalog.refreshTable(store.posTable)
    val second = rows(CleanStream.cleanAndIngest(
      spark, store, Seq((2L, p)).toDF("doc_id", "text"), minWords = 10))
    assert(second == Seq((2L, 10L, 10L, "")),
      "duplicate stored span rows fragmented the removal extent")
  }

  test("first arrival keeps the passage, even with the higher doc_id") {
    import spark.implicits._
    val store = CleanStream.build(spark, "specord")
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val first = CleanStream.cleanAndIngest(spark, store,
      Seq((10L, passage)).toDF("doc_id", "text"), minWords = 8)
    assert(rows(first) == Seq((10L, 8L, 0L, passage)),
      "first arrival must pass through intact")
    val second = CleanStream.cleanAndIngest(spark, store,
      Seq((5L, passage)).toDF("doc_id", "text"), minWords = 8)
    assert(rows(second) == Seq((5L, 8L, 8L, "")),
      "the later arrival loses the passage despite its lower doc_id")
  }
}
