package graft.streaming

import graft.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The serving layout's ingest front door: a clustered table built from
  * incremental micro-batch appends under the frozen codebook must be
  * bit-identical to the batch [[Similarity.ensureClustered]] build —
  * which makes every streamed vector visible to the q26c/q143 serving
  * plans — and a replayed batch must append nothing.
  */
class AnnStreamSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def corpus() = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
      .sortBy(_._1)
  }

  /** The labeled form — the layout carries the filterable attribute
    * (q166), so the ingest stream ships it too.
    */
  private def labeledCorpus() = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect().toSeq
      .sortBy(_._1)
  }

  private def rowsOf(table: String) =
    spark.table(table).select("vec_id", "qe", "label", "cid")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), Option(r.get(2)),
        r.getInt(3)))
      .sortBy(_._1).toSeq

  test("incrementally streamed layout ≡ the batch clustered build bit-exactly") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cents = Similarity.ensureTrained(spark, dir)
    val table = Similarity.buildClusteredEmpty(spark,
      s"annstream${System.nanoTime()}")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-annstream-").toString
    val input = MemoryStream[(Long, Seq[Float], Int)]
    val query = AnnStream.startIncremental(spark,
      input.toDS().toDF("vec_id", "embedding", "label"), table, ckpt, cents,
      compactEvery = 2) // exercise in-stream compaction too
    try {
      labeledCorpus().grouped(180).foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()

    val batchTable = Similarity.ensureClustered(spark, dir)
    val streamed = rowsOf(table)
    assert(streamed.nonEmpty)
    assert(streamed == rowsOf(batchTable),
      "incremental appends must reproduce the batch clustered layout")

    // the streamed layout serves the q26c probe identically to the
    // batch table — streamed vectors are immediately servable
    val cq = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") === 0)
      .select(graft.functions.Exact.quantize(col("embedding")).as("qe"))
      .head().getSeq[Long](0)
    def probe(t: String) = {
      val pc = graft.functions.ProbeCentroids
      spark.table(t)
        .join(spark.range(1).select(
          explode(pc(typedlit(cq), cents, 2)).as("cid")), Seq("cid"))
        .select(col("vec_id"),
          graft.functions.Exact
            .cosineFromQuantized(col("qe"), typedlit(cq)).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    assert(probe(table) == probe(batchTable))
  }

  test("compaction shrinks the file set, preserves rows, and heals a crashed swap") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cents = Similarity.ensureTrained(spark, dir)
    val table = Similarity.buildClusteredEmpty(spark,
      s"anncompact${System.nanoTime()}")
    val (first, second) = corpus().splitAt(250)
    // several appends → one file set per partition per append
    first.grouped(50).foreach(g =>
      Similarity.appendClustered(spark, table, g.toDF("vec_id", "embedding"),
        cents))
    def parquetFiles(): Int = {
      val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(new java.io.File(wh.getPath), table))
        .count(_.getName.endsWith(".parquet"))
    }
    val before = parquetFiles()
    val rowsBefore = rowsOf(table)
    graft.sources.Bucketed.compactPartitioned(spark, table, "cid")
    assert(parquetFiles() < before,
      s"compaction must shrink the file set ($before files before)")
    assert(rowsOf(table) == rowsBefore, "compaction must preserve rows")

    // crash window: twin fully materialized, canonical dropped — the
    // next startIncremental must adopt the twin before its first append
    spark.table(table).write.partitionBy("cid").mode("overwrite")
      .saveAsTable(s"${table}_compact")
    graft.sources.Bucketed.dropStale(spark, table)
    assert(!spark.catalog.tableExists(table), "crash state: canonical gone")
    val input = MemoryStream[(Long, Seq[Float])]
    val query = AnnStream.startIncremental(spark,
      input.toDS().toDF("vec_id", "embedding"), table,
      java.nio.file.Files.createTempDirectory("graft-annheal-").toString,
      cents)
    try {
      input.addData(second)
      query.processAllAvailable()
    } finally query.stop()
    assert(spark.catalog.tableExists(table), "open path adopted the twin")
    assert(!spark.catalog.tableExists(s"${table}_compact"))
    assert(spark.table(table).count() ==
      (first.size + second.size).toLong,
      "healed table must carry the pre-crash rows plus the new batch")
  }

  test("a replayed micro-batch appends nothing") {
    import spark.implicits._
    val cents = Similarity.ensureTrained(spark, dir)
    val table = Similarity.buildClusteredEmpty(spark,
      s"annreplay${System.nanoTime()}")
    val (first, second) = corpus().splitAt(250)
    Similarity.appendClustered(spark, table,
      first.toDF("vec_id", "embedding"), cents)
    val rows = spark.table(table).count()
    assert(rows == first.size.toLong)
    Similarity.appendClustered(spark, table,
      second.toDF("vec_id", "embedding"), cents)
    val all = spark.table(table).count()
    // crash-after-append replay: the same batch appended again
    Similarity.appendClustered(spark, table,
      second.toDF("vec_id", "embedding"), cents)
    assert(spark.table(table).count() == all,
      "layout rows must not duplicate on replay")
  }
}
