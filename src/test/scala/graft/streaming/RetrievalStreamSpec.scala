package graft.streaming

import graft.SparkTestSession
import graft.operators.{Retrieval, Similarity}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** The ANN serving front door: per-trigger serving over the clustered
  * layout must equal the batch q143 path query-for-query (serving is
  * stateless — micro-batch boundaries must be invisible in the
  * answers), and the per-batch layout scan must stay partition-pruned
  * (a serving tier that full-scans the corpus per request batch is the
  * rejected design).
  */
class RetrievalStreamSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def queryVectors(n: Int): Seq[(Long, Seq[Float])] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") < n)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "vec_id", "cos_sim", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

  test("streamed serving across micro-batches ≡ one batch serveTopK, bit-exact") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val qs = queryVectors(6)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-retstream-").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val served = ArrayBuffer.empty[(Long, Long, Double, Long)]
    val query = RetrievalStream.start(spark,
      input.toDS().toDF("query_id", "embedding"), dir, ckpt,
      onResults = res => served.synchronized { served ++= rowsOf(res) })
    try {
      qs.grouped(2).foreach { b => // 3 micro-batches of 2 queries
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()

    val batch = Retrieval.serveTopK(spark, dir,
      qs.toDF("query_id", "embedding"))
    val expect = rowsOf(batch).sorted.toSeq
    assert(expect.size == qs.size * 10, "each query gets a full top-10")
    assert(served.sorted.toSeq == expect,
      "micro-batch boundaries must be invisible in the served answers")
  }

  test("per-batch layout scan is partition-pruned to the probed clusters") {
    import spark.implicits._
    Similarity.ensureTrained(spark, dir)
    Similarity.ensureClustered(spark, dir)
    // pruning is a static property of the literal isin partition filter;
    // AQE hides the scan inside unexecuted stages (the q60b lesson)
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrior = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "false")
    val scans =
      try {
        val plan = Retrieval.serveTopK(spark, dir,
          queryVectors(2).toDF("query_id", "embedding"))
        plan.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec
              if s.verboseStringWithSuffix(1000).toLowerCase
                .contains("graft_annclu") =>
            s
        }
      } finally aqePrior match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None => spark.conf.unset(aqeKey)
      }
    assert(scans.nonEmpty, "expected a scan of the clustered layout")
    scans.foreach { s =>
      // the literal isin prunes STATICALLY; the cid join may add a
      // DynamicPruningExpression on top, which is unevaluable before
      // execution — the static filter alone must already bound the scan
      val static = s.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]))
      assert(static.nonEmpty,
        s"serving scan carries no static partition filter:\n$s")
      // 2 queries × nprobe=2 → at most 4 distinct probed partitions
      val selected = s.relation.location.listFiles(static, Nil)
      assert(selected.size <= 4,
        s"expected <= 4 pruned partitions, scanned ${selected.size}")
    }
  }

  test("serving composes with AnnStream ingest: trigger-N vectors answer trigger-N+1 queries") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cents = Similarity.ensureTrained(spark, dir)
    val table = Similarity.buildClusteredEmpty(spark,
      s"servecompose${System.nanoTime()}")
    val all = {
      graft.Tables.load(spark, dir, "embeddings")
        .select("vec_id", "embedding").as[(Long, Seq[Float])]
        .collect().toSeq.sortBy(_._1)
    }
    val (first, second) = all.splitAt(250)
    val vin = MemoryStream[(Long, Seq[Float])]
    val ingest = AnnStream.startIncremental(spark,
      vin.toDS().toDF("vec_id", "embedding"), table,
      java.nio.file.Files.createTempDirectory("graft-compose-i-").toString,
      cents)
    val qin = MemoryStream[(Long, Seq[Float])]
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Long)]
    val serve = RetrievalStream.start(spark,
      qin.toDS().toDF("query_id", "embedding"), dir,
      java.nio.file.Files.createTempDirectory("graft-compose-s-").toString,
      onResults = r => buf.synchronized { buf ++= rowsOf(r) },
      table = Some(table))
    try {
      // phase 1: half the corpus ingested — answers draw ONLY from it
      vin.addData(first); ingest.processAllAvailable()
      qin.addData(queryVectors(2)); serve.processAllAvailable()
      val firstIds = first.map(_._1).toSet
      val phase1 = buf.synchronized { val s0 = buf.toSeq; buf.clear(); s0 }
      assert(phase1.nonEmpty)
      assert(phase1.forall(r => firstIds(r._2)),
        "phase-1 answers must only contain ingested vectors")
      // phase 2: rest ingested — serving now equals the batch answer
      vin.addData(second); ingest.processAllAvailable()
      qin.addData(queryVectors(2)); serve.processAllAvailable()
      val phase2 = buf.synchronized(buf.toSeq)
      val expect = rowsOf(Retrieval.serveTopK(spark, dir,
        queryVectors(2).toDF("query_id", "embedding")))
      assert(phase2.sorted.toSeq == expect.sorted.toSeq,
        "fully-ingested streamed layout must serve the batch answer")
    } finally { ingest.stop(); serve.stop() }
  }

  test("re-serving a batch is deterministic; an empty batch serves nothing") {
    import spark.implicits._
    val b = queryVectors(3).toDF("query_id", "embedding")
    val first = rowsOf(Retrieval.serveTopK(spark, dir, b)).sorted.toSeq
    val again = rowsOf(Retrieval.serveTopK(spark, dir, b)).sorted.toSeq
    assert(first.nonEmpty && first == again,
      "replayed serving must reproduce identical answers")
    val empty = spark.emptyDataset[(Long, Seq[Float])]
      .toDF("query_id", "embedding")
    assert(Retrieval.serveTopK(spark, dir, empty).count() == 0)
  }
}
