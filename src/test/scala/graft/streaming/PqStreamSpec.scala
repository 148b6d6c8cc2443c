package graft.streaming

import graft.SparkTestSession
import graft.operators.{ProductQuant, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The PQ codes store's streaming front door: a store built from
  * incremental micro-batch upserts under frozen codebooks must be
  * bit-identical to the batch build over the same vectors, and the
  * at-least-once replay of a batch must append nothing.
  */
class PqStreamSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def corpus() = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
  }

  private def contents(table: String): Seq[(Long, Seq[Long], Int)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getInt(2)))
      .sortBy(_._1).toSeq

  test("incrementally streamed codes store ≡ the batch build, bit-exactly") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cents = Similarity.ensureTrained(spark, dir)
    val cb = ProductQuant.ensureTrained(spark, dir)
    val tag = s"stream${System.nanoTime()}"
    val empty = ProductQuant.build(spark,
      spark.emptyDataset[(Long, Seq[Float])].toDF("vec_id", "embedding"),
      cents, cb, tag)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pqstream-").toString

    val input = MemoryStream[(Long, Seq[Float])]
    val query = PqStream.startIncremental(spark,
      input.toDS().toDF("vec_id", "embedding"), empty, ckpt, cents, cb,
      compactEvery = 2) // in-stream compaction must not perturb contents
    try {
      corpus().grouped(180).foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()

    val batch = ProductQuant.build(spark,
      corpus().toDF("vec_id", "embedding"), cents, cb, s"batch${System.nanoTime()}")
    val streamed = contents(empty)
    assert(streamed.nonEmpty)
    assert(streamed == contents(batch),
      "incremental upserts must reproduce the batch-built codes store bit-exactly")
  }

  test("a replayed micro-batch appends nothing") {
    import spark.implicits._
    val cents = Similarity.ensureTrained(spark, dir)
    val cb = ProductQuant.ensureTrained(spark, dir)
    val all = corpus()
    val (first, second) = all.splitAt(250)
    val table = ProductQuant.build(spark,
      first.toDF("vec_id", "embedding"), cents, cb, s"replay${System.nanoTime()}")
    ProductQuant.appendFresh(spark, table, second.toDF("vec_id", "embedding"),
      cents, cb)
    val afterOnce = contents(table)
    assert(afterOnce.map(_._1) == all.map(_._1).sorted)
    // the replay: same batch re-offered — vec_id anti-join must drop all
    ProductQuant.appendFresh(spark, table, second.toDF("vec_id", "embedding"),
      cents, cb)
    assert(contents(table) == afterOnce, "replayed batch must append nothing")
  }
}
