package graft.streaming

import graft.SparkTestSession
import graft.operators.DupGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the incremental connected-components label store:
  *
  *  1. Stream ≡ batch — ingesting the corpus's verified pair list in
  *     chunks (splitting clusters across batches, forcing cross-batch
  *     merges) reproduces the batch [[DupGraph.labels]] exactly, and
  *     compaction changes nothing.
  *  2. Replay is a no-op: re-ingested pairs relabel nothing and ledger
  *     nothing.
  *  3. Cross-batch merges relabel EXISTING clusters: two established
  *     clusters joined by one late edge collapse to the global min id,
  *     including members whose own edges arrived batches earlier.
  */
class GraphStreamSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def labelRows(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("chunked pair ingest ≡ batch DupGraph labels; replay no-op; compaction stable") {
    import spark.implicits._
    val pairs = DupGraph.pairs(spark, dir)
      .select(col("doc_id_1"), col("doc_id_2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(p => (p._1, p._2))
    assert(pairs.nonEmpty, "gate corpus should have verified pairs")
    val store = GraphStream.build(spark, "spec")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gs-ckpt-").toString

    val src = Sources.queue[(Long, Long)](spark)
    val query = GraphStream.startIncremental(
      spark, src.toDS().toDF("doc_id_1", "doc_id_2"), store, ckpt,
      compactEvery = 2)
    try {
      pairs.grouped(math.max(1, pairs.size / 7)).foreach { g =>
        src.addData(g)
        query.processAllAvailable()
      }
    } finally query.stop()

    val batch = labelRows(DupGraph.labels(spark, dir))
    assert(labelRows(GraphStream.labels(spark, store)) == batch,
      "streamed labels diverged from the batch CC labels")

    // replay: the ledger absorbs re-delivered pairs
    val edgesBefore = spark.table(store.edgeTable).count()
    val logBefore = spark.table(store.labelTable).count()
    GraphStream.ingest(spark, store,
      pairs.take(5).toDF("doc_id_1", "doc_id_2"), gen = 999L)
    assert(spark.table(store.edgeTable).count() == edgesBefore,
      "replayed pairs entered the edge ledger")
    assert(spark.table(store.labelTable).count() == logBefore,
      "replayed pairs appended label rows")

    // compaction collapses the log without changing the read
    GraphStream.compact(spark, store)
    assert(labelRows(GraphStream.labels(spark, store)) == batch,
      "compaction changed the labels")
    val collapsed = spark.table(store.labelTable)
    assert(collapsed.count() == batch.size.toLong,
      "compacted log should hold exactly one row per labeled doc")
  }

  test("a late edge merges two established clusters down to the global min id") {
    import spark.implicits._
    val store = GraphStream.build(spark, "specmerge")
    GraphStream.ingest(spark, store, Seq((20L, 30L)).toDF("a", "b"), gen = 1L)
    assert(labelRows(GraphStream.labels(spark, store)) == Seq((20L, 20L), (30L, 20L)))
    GraphStream.ingest(spark, store, Seq((40L, 50L)).toDF("a", "b"), gen = 2L)
    // the bridge merges both clusters; 20's cluster must relabel to 20
    // ... and a second bridge to a LOWER new node relabels everyone
    GraphStream.ingest(spark, store, Seq((30L, 40L)).toDF("a", "b"), gen = 3L)
    assert(labelRows(GraphStream.labels(spark, store)) ==
      Seq((20L, 20L), (30L, 20L), (40L, 20L), (50L, 20L)),
      "bridged clusters must collapse to the min id across BOTH")
    GraphStream.ingest(spark, store, Seq((10L, 50L)).toDF("a", "b"), gen = 4L)
    assert(labelRows(GraphStream.labels(spark, store)) ==
      Seq((10L, 10L), (20L, 10L), (30L, 10L), (40L, 10L), (50L, 10L)),
      "a lower-id late arrival must relabel every established member")
  }
}
