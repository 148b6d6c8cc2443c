package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q59's skew guard (the `MaxSpanDf` document-frequency cap), the
  * way the LSH band-occupancy guard pins q23's: the candidate-pair
  * volume of the span self-join must stay linear-ish in the corpus —
  * Σ_h C(df_h, 2) ≤ |span rows| × (MaxSpanDf − 1) / 2 — and a span that
  * appears in more than MaxSpanDf documents must contribute ZERO pairs.
  * Runs the volume audit at sf0.1 (the bench scale) through the exact
  * gated code path ([[Dedup.spanHashes]] / [[Dedup.spanCandidatePairs]]).
  */
class SpanBoundSpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.1"

  test("sf0.1: post-filter df ≤ cap and pair volume obeys the linear bound") {
    // the bench-scale corpus is optional on dev machines: cancel (not
    // fail) when absent, like the sf0.01-based suites' existence guards
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val docs = Tables.load(spark, dir, "documents")
    val sp = Dedup.spanHashes(docs).persist()
    try {
      val spanRows = sp.count()
      val rare = sp.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= Dedup.MaxSpanDf)
      val stats = rare
        .agg(max(col("df")).as("max_df"),
          sum(col("df") * (col("df") - 1)).as("twice_pairs"))
        .head()
      val maxDf = stats.getLong(0)
      val expectedPairs = stats.getLong(1) / 2
      val actualPairs = Dedup.spanCandidatePairs(docs).count()

      assert(maxDf <= Dedup.MaxSpanDf,
        s"post-filter max span df $maxDf exceeds cap ${Dedup.MaxSpanDf}")
      assert(actualPairs == expectedPairs,
        s"join produced $actualPairs candidate rows; Σ C(df,2) = $expectedPairs " +
          "— candidates leaked in from somewhere other than the rare-span equi-join")
      val linearBound = spanRows * (Dedup.MaxSpanDf - 1) / 2
      assert(actualPairs <= linearBound,
        s"candidate volume $actualPairs exceeds the linear bound $linearBound")
    } finally sp.unpersist()
  }

  test("a span in more than MaxSpanDf docs contributes zero pairs") {
    import spark.implicits._
    // MaxSpanDf + 1 docs all sharing ONE 8-word span (8 words → exactly
    // one shingle each): df = cap + 1, so the guard must drop it — the
    // C(101, 2) = 5050 would-be pairs never reach the join. Two more
    // docs share a genuinely rare span and must still pair.
    val heavy = (0 until Dedup.MaxSpanDf + 1)
      .map(i => (i.toLong, "common boilerplate span one two three four five"))
    val rarePair = Seq(
      (900L, "rare shared span tokens alpha beta gamma delta"),
      (901L, "rare shared span tokens alpha beta gamma delta"))
    val docs = (heavy ++ rarePair).toDF("doc_id", "text")

    val pairs = Dedup.spanCandidatePairs(docs).collect()
    assert(pairs.length == 1, s"expected only the rare pair, got ${pairs.length}")
    assert(pairs.head.getLong(0) == 900L && pairs.head.getLong(1) == 901L)
  }
}
