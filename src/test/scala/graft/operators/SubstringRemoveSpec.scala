package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q130 rewrite against the q117/q119 span machinery it closes
  * the loop on:
  *
  *  1. Mass identity — at `minWords = 8` (every match is an extent, a
  *     single shared span being 8 words) the removed-token total must
  *     equal the DISTINCT d2-side covered-position mass of
  *     [[Dedup.spanPosMatches]] exactly: a diagonal island's d2-side
  *     extent [min p2, max p2 + 7] is precisely the union of its
  *     constituent spans' 8-word windows, so splice-by-extent and
  *     cover-by-span must agree token for token. This is also the
  *     "keep the lowest-doc_id occurrence" half of q119's two-sided
  *     covered mass (removed ⊆ covered).
  *  2. Reconstruction accounting — for every document the spliced text
  *     has exactly `n_tokens_before − n_removed` tokens, and a document
  *     with zero removals passes through byte-identical.
  */
class SubstringRemoveSpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.01"

  test("removed mass at minWords=8 equals the d2-side covered-position mass") {
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val docs = Tables.load(spark, dir, "documents")
    val removed = Dedup.substringRemove(docs, 8)
      .agg(sum(col("n_removed"))).head().getLong(0)
    val m = Dedup.spanPosMatches(docs)
    val d2Covered = m
      .select(col("d2").as("doc_id"), col("p2").as("p"))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + lit(7))).as("wp"))
      .distinct().count()
    assert(removed == d2Covered,
      s"spliced $removed tokens but the d2-side span cover is $d2Covered")
    // removed ⊆ q119's two-sided covered mass
    val bothCovered = m
      .select(col("d1").as("doc_id"), col("p1").as("p"))
      .union(m.select(col("d2"), col("p2")))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + lit(7))).as("wp"))
      .distinct().count()
    assert(removed <= bothCovered)
  }

  test("token accounting and untouched-doc passthrough at the gate threshold") {
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val docs = Tables.load(spark, dir, "documents")
    val out = Dedup.substringRemove(docs, Dedup.MinRemoveWords).persist()
    try {
      assert(out.count() == docs.count(), "rewrite must keep every document")
      // split("") is [""], so the fully-removed case is asserted as the
      // empty string rather than through the token count
      val badCounts = out.filter(
        when(col("clean_text") === "", col("n_removed") =!= col("n_tokens_before"))
          .otherwise(size(split(col("clean_text"), " "))
            =!= col("n_tokens_before") - col("n_removed"))).count()
      assert(badCounts == 0, s"$badCounts docs break n_before - n_removed accounting")
      val touched = out.filter(col("n_removed") > 0).count()
      assert(touched > 0, "gate corpus should exercise the rewrite")
      val mutatedUntouched = out.join(docs, Seq("doc_id"))
        .filter(col("n_removed") === 0 && col("clean_text") =!= col("text"))
        .count()
      assert(mutatedUntouched == 0, "zero-removal docs must pass through unchanged")
    } finally out.unpersist()
  }
}
