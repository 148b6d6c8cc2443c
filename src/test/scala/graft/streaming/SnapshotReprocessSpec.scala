package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.operators.Similarity
import graft.sources.EmbeddingIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-ingest composition q88 plans for: an index built from
  * an OLD crawl snapshot, a snapshot diff computing the re-process set
  * (here: `added` keys — the anti-join q88 classifies), and ONLY that
  * set streamed through the index's front door must converge to exactly
  * the index a full batch rebuild of the new snapshot produces — pinned
  * via q52/q25's pair equivalence, the same yardstick as
  * `EmbeddingStreamSpec`. This is the end-to-end proof that a recrawl
  * never needs the 100 TB rebuild: old index + diff-driven upserts ≡
  * fresh build.
  */
class SnapshotReprocessSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("old index + diff-driven upserts converge to the full rebuild") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
    // old crawl: every key except the vec_id % 7 == 0 slice (q88's split)
    val old = all.filter(_._1 % 7 != 0)
    val table = EmbeddingIndex.build(spark,
      old.toDF("vec_id", "embedding"), s"reproc${System.nanoTime()}")

    // the q88 step, against the live index: new-snapshot keys the store
    // has never seen — the re-process set (the store side of the
    // anti-join reads only vec_id, never vectors)
    val added = all.toDF("vec_id", "embedding")
      .join(spark.table(table).select("vec_id"), Seq("vec_id"), "left_anti")
      .as[(Long, Seq[Float])].collect().toSeq
    assert(added.nonEmpty && added.size == all.size - old.size,
      "the diff must be exactly the withheld slice")

    val input = MemoryStream[(Long, Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-reproc-").toString
    val query = EmbeddingStream.startIncremental(spark,
      input.toDS().toDF("vec_id", "embedding"), table, ckpt)
    try {
      added.grouped(25).foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()

    assert(spark.table(table).select("vec_id").distinct().count() == all.size,
      "every diffed key lands exactly once")
    val fromStream = EmbeddingIndex.pairs(spark, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    val fromRaw = Similarity.qEmbedNearDup.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(fromStream.nonEmpty && fromStream == fromRaw,
      "diff-driven incremental ingest must equal the batch rebuild bit-exactly")
  }
}
