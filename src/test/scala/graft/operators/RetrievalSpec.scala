package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q93's string-kernel term statistics against the explode-based
  * reference definition: the bracketed-string `replace` length delta
  * must count exactly the whole-token occurrences that `split` +
  * equality counting produces, and `dl` must equal the split token
  * count — on the real corpus, for every query term, including docs
  * with zero occurrences. (The kernel exists because it is map-side
  * codegen'd with no explode; the reference shape is the semantics.)
  */
class RetrievalSpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.01"

  test("bracket-replace tf/dl ≡ split-based token counts on sf0.01") {
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val terms = Seq("hash", "join", "vector", "scan")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        concat(lit("["), expr("replace(text, ' ', '][')"), lit("]")).as("br"))
    val kernelCols = col("doc_id") +:
      (((length(col("br")) - length(expr("replace(br, '][', '')"))) / 2) + 1)
        .cast("long").as("dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        ((length(col("br")) - length(expr(s"replace(br, '[$t]', '')"))) /
          (t.length + 2)).cast("long").as(s"tf$i")
      }
    val kernel = docs.select(kernelCols: _*)
    val refCols = col("doc_id") +:
      size(split(col("text"), " ")).cast("long").as("dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        size(filter(split(col("text"), " "), tok => tok === lit(t)))
          .cast("long").as(s"tf$i")
      }
    val ref = docs.select(refCols: _*)
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
    // the corpus actually exercises every term (a vacuous all-zero tf
    // column would pass equivalence without testing the counting)
    val hits = kernel.agg(
      terms.indices.map(i => sum(col(s"tf$i")).as(s"s$i")).head,
      terms.indices.map(i => sum(col(s"tf$i")).as(s"s$i")).tail: _*)
      .head()
    terms.indices.foreach(i => assert(hits.getLong(i) > 0L, s"term $i unseen"))
  }
}
