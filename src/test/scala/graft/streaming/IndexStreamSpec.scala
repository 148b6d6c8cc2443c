package graft.streaming

import graft.SparkTestSession
import graft.operators.{Corpus, Retrieval}
import graft.sources.{Bucketed, IndexStore}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stream≡batch equivalence of the inverted-index front door:
  * a store built from incremental micro-batch ingest must be
  * bit-identical to the batch build, the q154 serving plan over the
  * streamed store must reproduce the q93 batch result, replays append
  * nothing, and the postings-before-manifest crash window's duplicate
  * rows heal through the distinct compaction.
  */
class IndexStreamSpec extends AnyFunSuite with SparkTestSession {
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  private def postRows(t: String): Seq[(String, Long, Long, Long)] =
    spark.table(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq

  private def manRows(t: String): Seq[(Long, Long)] =
    spark.table(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("streamed index ≡ batch build; serve ≡ q93; replay appends nothing") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val store = IndexStore.build(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "streamspec")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-is-ckpt-").toString

    val src = Sources.queue[(Long, String)](spark)
    val query = IndexStream.startIncremental(
      spark, src.toDS().toDF("doc_id", "text"), store, ckpt,
      compactEvery = 2)
    try {
      docs.grouped(170).foreach { g =>
        src.addData(g.toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    val batch = IndexStore.build(spark, docs.toSeq.toDF("doc_id", "text"),
      "batchspec")
    assert(postRows(store.postings).nonEmpty)
    assert(postRows(store.postings) == postRows(batch.postings),
      "streamed postings must equal the batch build bit-exactly")
    assert(manRows(store.manifest) == manRows(batch.manifest))

    // serving from the streamed store ≡ the q93 batch result
    val served = Retrieval.bm25ServeFromIndex(spark, store).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val q93 = Corpus.qBm25TopK.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == q93,
      "the streamed store must serve the q93 result bit-exactly")

    // replay: re-offering an ingested batch appends nothing
    IndexStore.append(spark, store, docs.take(170).toSeq.toDF("doc_id", "text"))
    assert(postRows(store.postings) == postRows(batch.postings))
    assert(manRows(store.manifest) == manRows(batch.manifest))
  }

  test("crash-window duplicate postings heal through distinct compaction") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (pre, last) = docs.splitAt(docs.length - 1)
    val store = IndexStore.build(spark, pre.toSeq.toDF("doc_id", "text"),
      "crashspec")
    // crash window: postings of the last doc committed, manifest not —
    // replay re-indexes it and duplicates its postings rows exactly
    val (lastPost, _) = IndexStore.postingsOf(last.toSeq.toDF("doc_id", "text"))
    lastPost.write.bucketBy(IndexStore.Buckets, "tok").sortBy("tok")
      .mode("append").saveAsTable(store.postings)
    IndexStore.append(spark, store, last.toSeq.toDF("doc_id", "text"))
    val full = IndexStore.build(spark, docs.toSeq.toDF("doc_id", "text"),
      "fullspec")
    assert(postRows(store.postings) != postRows(full.postings),
      "the crash window must have produced duplicate rows (test setup)")
    Bucketed.compactDistinct(spark, store.postings, IndexStore.Buckets, "tok")
    assert(postRows(store.postings) == postRows(full.postings),
      "distinct compaction must heal the duplicates")
    assert(Retrieval.bm25ServeFromIndex(spark, store).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Retrieval.bm25ServeFromIndex(spark, full).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "the healed store must serve identically to a clean build")
  }
}
