package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SpanStore layout: its flushed rows equal the from-raw-text
  * span pipeline bit-for-bit (so store-reading reports can never fork
  * from the q59 definition), and two corpus dirs keep independent
  * readable stores in one JVM (the DupGraph per-corpus-tag discipline).
  */
class SpanStoreSpec extends AnyFunSuite with graft.SparkTestSession {

  private val dirA = "/root/testdata/sf0.001"

  test("store rows equal the raw-text span pipeline") {
    import org.apache.spark.sql.functions._
    val raw = Dedup.spanHashes(graft.Tables.load(spark, dirA, "documents"))
    val rawWithDf = raw.join(
      raw.groupBy(col("h")).agg(count(lit(1)).as("df")), Seq("h"))
    val stored = SpanStore.spans(spark, dirA)
      .select(col("h"), col("doc_id"), col("df"))
    assert(stored.collect().map(_.toString).sorted.toSeq ==
      rawWithDf.collect().map(_.toString).sorted.toSeq)
    val rareMax = SpanStore.rareSpans(spark, dirA)
      .agg(max(col("df"))).collect().head.getLong(0)
    assert(rareMax <= Dedup.MaxSpanDf)
  }

  test("two corpus dirs keep independent readable stores in one JVM") {
    val dirB = java.nio.file.Files.createTempDirectory("spanstore-b").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dirA/documents.parquet"),
      java.nio.file.Paths.get(s"$dirB/documents.parquet"))
    val nA = SpanStore.spans(spark, dirA).count()
    val nB = SpanStore.spans(spark, dirB).count()
    assert(nA == nB)
    // A's memoized path must survive B's build
    assert(SpanStore.spans(spark, dirA).count() == nA)
  }
}
