package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q206's removed-mass accounting (the SubstringRemoveSpec
  * discipline applied to the INTRA-doc trim) plus the closed-form rule
  * on literal documents where the expected trim is hand-computable.
  */
class RepetitionTrimSpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.01"

  private def trim(docs: org.apache.spark.sql.DataFrame) = {
    val g = docs.select(col("doc_id"),
      posexplode(graft.functions.WordShingles(col("text"), 3))
        .as(Seq("p", "gram")))
    val first = g.groupBy(col("doc_id"), col("gram"))
      .agg(min(col("p")).as("fp"))
    val rpos = g.join(first, Seq("doc_id", "gram"))
      .filter(col("p") > col("fp"))
      .select(col("doc_id"),
        explode(sequence(col("p").cast("long"), col("p").cast("long") + 2L))
          .as("wp"))
      .distinct()
      .groupBy(col("doc_id")).agg(collect_list(col("wp")).as("rpos"))
    Dedup.spliceTokens(docs, rpos)
  }

  test("token accounting: trimmed docs lose exactly n_removed tokens, " +
    "untouched docs pass through byte-identical") {
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val docs = Tables.load(spark, dir, "documents")
    val out = Corpus.qRepetitionTrim.build(spark, dir)
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
    val bad = out.filter(
      size(split(col("trimmed_text"), " ")).cast("long")
        =!= col("n_tokens_before") - col("n_removed")
        && !(col("n_removed") === col("n_tokens_before")
          && length(col("trimmed_text")) === 0))
    assert(bad.count() == 0, "token accounting violated")
    val untouched = out.filter(col("n_removed") === 0L)
      .filter(col("trimmed_text") =!= col("text"))
    assert(untouched.count() == 0, "an untrimmed doc was rewritten")
    assert(out.filter(col("n_removed") > 0L).count() > 0,
      "sf0.01 contains intra-doc trigram repeats to trim")
  }

  test("closed-form rule on literal docs (first occurrence kept, " +
    "overlapping repeats unioned)") {
    import spark.implicits._
    val docs = Seq(
      // plain repeat: trigram (a b c) at p=0 and p=4 → remove 4..6
      (1L, "a b c d a b c"),
      // self-overlapping run: gram (a a a) at 0,1,2 → remove 1..4
      (2L, "a a a a a"),
      // no trigram repeat (distinct 3-grams throughout)
      (3L, "x y z w x y"),
      // too short to shingle
      (4L, "p q")
    ).toDF("doc_id", "text")
    val got = trim(docs)
      .select(col("doc_id"), col("n_removed"), col("clean_text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got(1L) == ((3L, "a b c d")))
    assert(got(2L) == ((4L, "a")))
    assert(got(3L) == ((0L, "x y z w x y")))
    assert(got(4L) == ((0L, "p q")))
  }
}
