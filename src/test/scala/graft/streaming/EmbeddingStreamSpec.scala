package graft.streaming

import graft.SparkTestSession
import graft.operators.Similarity
import graft.sources.EmbeddingIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** The embedding index's streaming front door: an index built from
  * incremental micro-batch upserts (with in-stream compaction) must be
  * indistinguishable from a batch build — q52's from-index pairs, whose
  * oracle is q25's from-raw SQL, are the equivalence check — and the
  * at-least-once replay of a batch must change nothing.
  */
class EmbeddingStreamSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def corpus() = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
  }

  private def emptyIndex(tag: String): String = {
    import spark.implicits._
    EmbeddingIndex.build(spark,
      spark.emptyDataset[(Long, Seq[Float])].toDF("vec_id", "embedding"), tag)
  }

  test("incrementally streamed index reproduces the batch q52/q25 pairs bit-exactly") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = emptyIndex(s"stream${System.nanoTime()}")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-embstream-").toString

    val input = MemoryStream[(Long, Seq[Float])]
    val flagged = ArrayBuffer.empty[(Long, Long)]
    val query = EmbeddingStream.startIncremental(spark,
      input.toDS().toDF("vec_id", "embedding"), table, ckpt,
      onFlagged = v => flagged.synchronized {
        flagged ++= v.collect().map(r => (r.getLong(0), r.getLong(1)))
      },
      compactEvery = 2) // exercise in-stream compaction too
    try {
      corpus().grouped(180).foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()

    val fromStream = EmbeddingIndex.pairs(spark, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val fromRaw = Similarity.qEmbedNearDup.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(fromStream.nonEmpty, "sf0.001 contains embedding near-dup pairs")
    assert(fromStream == fromRaw,
      "incremental upserts must reproduce the batch-built index bit-exactly")

    // cross-batch near-dups were flagged on arrival (a vector whose twin
    // landed in an EARLIER batch), and every verdict is a real pair of
    // the batch answer — no self-pairs, no phantom flags
    val pairSet = fromRaw.map { case (a, b, _) => (a, b) }.toSet
    assert(flagged.nonEmpty, "cross-batch twins must be flagged on arrival")
    flagged.foreach { case (v, d) =>
      assert(v != d, "self-pairs must never be flagged")
      assert(pairSet.contains((math.min(v, d), math.max(v, d))),
        s"flag ($v, $d) is not a pair of the batch answer")
    }
  }

  test("a replayed micro-batch appends nothing and reproduces its verdicts") {
    import spark.implicits._
    val all = corpus()
    val table = emptyIndex(s"replay${System.nanoTime()}")
    val (first, second) = all.splitAt(250)
    EmbeddingIndex.appendFresh(spark, table, first.toDF("vec_id", "embedding"))

    val batch = second.toDF("vec_id", "embedding")
    val verdicts0 = EmbeddingIndex.probe(spark, table, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    EmbeddingIndex.appendFresh(spark, table, batch)
    val rows = spark.table(table).count()

    // crash-after-append replay: same batch probed and appended again
    val verdicts1 = EmbeddingIndex.probe(spark, table, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    EmbeddingIndex.appendFresh(spark, table, batch)
    assert(verdicts1 == verdicts0,
      "replay verdicts must match the original run (batch-local vec_ids excluded)")
    assert(spark.table(table).count() == rows,
      "index rows must not duplicate on replay")

    // the replay-complete index still equals the batch build
    val fromIndex = EmbeddingIndex.pairs(spark, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val fromRaw = Similarity.qEmbedNearDup.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(fromIndex == fromRaw)
  }

  test("startIncremental heals a crashed compaction swap before the first probe") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = corpus()
    val table = emptyIndex(s"heal${System.nanoTime()}")
    val (first, second) = all.splitAt(250)
    EmbeddingIndex.appendFresh(spark, table, first.toDF("vec_id", "embedding"))
    val rows = spark.table(table).count()

    // simulate the crash window inside compact: the _compact twin is
    // fully materialized, the canonical table already dropped — a fresh
    // run's FIRST batch probes before any compaction batch could heal it
    spark.table(table).write
      .bucketBy(EmbeddingIndex.Buckets, "band", "bh").sortBy("band", "bh")
      .mode("overwrite").saveAsTable(s"${table}_compact")
    graft.sources.Bucketed.dropStale(spark, table)
    assert(!spark.catalog.tableExists(table), "crash state: canonical gone")

    val ckpt = java.nio.file.Files.createTempDirectory("graft-embheal-").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val flagged = ArrayBuffer.empty[(Long, Long)]
    val query = EmbeddingStream.startIncremental(spark,
      input.toDS().toDF("vec_id", "embedding"), table, ckpt,
      onFlagged = v => flagged.synchronized {
        flagged ++= v.collect().map(r => (r.getLong(0), r.getLong(1)))
      })
    try {
      input.addData(second)
      query.processAllAvailable()
    } finally query.stop()

    assert(spark.catalog.tableExists(table), "open path adopted the twin")
    assert(!spark.catalog.tableExists(s"${table}_compact"))
    assert(spark.table(table).count() > rows, "batch appended after healing")
    val fromIndex = EmbeddingIndex.pairs(spark, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val fromRaw = Similarity.qEmbedNearDup.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(fromIndex == fromRaw,
      "healed + streamed index must equal the batch build")
  }
}
