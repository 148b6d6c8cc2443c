package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd hash-array expressions must be drop-in equivalent to the
  * composed-builtin formulations they replaced (which stay here as the
  * executable spec): same values, same order, same degenerate-input
  * behavior — on seeded random corpora including whitespace edge cases.
  */
class TextHashesSpec extends AnyFunSuite with SparkTestSession {

  /** The original interpreted char-n-gram pipeline (pre-optimization). */
  private def composedCharGrams(text: Column): Column =
    when(length(text) >= 3,
      array_distinct(transform(sequence(lit(1), length(text) - 2),
        i => PolyHash(text.substr(i, lit(3))))))
      .otherwise(array().cast("array<bigint>"))

  /** The original interpreted word-shingle pipeline (pre-optimization). */
  private def composedShingles(text: Column, k: Int): Column = {
    val tok = split(text, " ")
    if (k == 1) array_distinct(transform(tok, x => PolyHash(x)))
    else {
      val n = greatest(size(tok) - (k - 1), lit(0))
      val joined = (2 to k).foldLeft(slice(tok, lit(1), n)) { (acc, j) =>
        zip_with(acc, slice(tok, lit(j), n), (a, b) => concat(a, lit(" "), b))
      }
      array_distinct(transform(joined, x => PolyHash(x)))
    }
  }

  private def corpus(seed: Int, rows: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val words = Seq("alpha", "beta", "gamma", "delta", "x", "", "longerword")
    (1 to rows).map { _ =>
      rnd.nextInt(6) match {
        case 0 => "" // empty text
        case 1 => words(rnd.nextInt(words.size)) // single token
        case 2 => Seq.fill(2 + rnd.nextInt(20))(
          words(rnd.nextInt(words.size))).mkString(" ") // normal
        case 3 => " " + Seq.fill(3)(words(rnd.nextInt(words.size)))
          .mkString(" ") + " " // leading/trailing space (empty tokens)
        case 4 => rnd.alphanumeric.take(rnd.nextInt(50)).mkString // no spaces
        case _ => Seq.fill(1 + rnd.nextInt(4))(
          rnd.alphanumeric.take(rnd.nextInt(8)).mkString).mkString("  ") // double spaces
      }
    }
  }

  test("CharNgramHashes(3) ≡ composed substr/transform pipeline") {
    import spark.implicits._
    val df = corpus(42, 300).toDF("text")
    val mismatches = df.select(
        CharNgramHashes(col("text"), 3).as("fast"),
        composedCharGrams(col("text")).as("slow"))
      .filter(not(col("fast") === col("slow")))
      .count()
    assert(mismatches == 0)
  }

  test("WordShingleHashes(3) ≡ composed split/slice/zip_with pipeline") {
    import spark.implicits._
    val df = corpus(7, 300).toDF("text")
    val mismatches = df.select(
        WordShingleHashes(col("text"), 3).as("fast"),
        composedShingles(col("text"), 3).as("slow"))
      .filter(not(col("fast") === col("slow")))
      .count()
    assert(mismatches == 0)
  }

  test("WordShingleHashes(1) ≡ per-token PolyHash with distinct") {
    import spark.implicits._
    val df = corpus(13, 300).toDF("text")
    val mismatches = df.select(
        WordShingleHashes(col("text"), 1).as("fast"),
        composedShingles(col("text"), 1).as("slow"))
      .filter(not(col("fast") === col("slow")))
      .count()
    assert(mismatches == 0)
  }

  test("WordShingles(2) ≡ composed join WITHOUT distinct (occurrences kept)") {
    import spark.implicits._
    val df = corpus(29, 300).toDF("text")
    // the composed reference: slice/zip_with join of adjacent tokens,
    // duplicates preserved (the frequency-counting semantics)
    val tok = split(col("text"), " ")
    val n = greatest(size(tok) - 1, lit(0))
    val slow = zip_with(slice(tok, lit(1), n), slice(tok, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
    val mismatches = df.select(
        WordShingles(col("text"), 2).as("fast"), slow.as("slow"))
      .filter(not(col("fast") === col("slow")))
      .count()
    assert(mismatches == 0)
  }

  test("HashedLinearScore ≡ composed distinct-shingle aggregate pipeline") {
    import spark.implicits._
    val df = corpus(61, 300).toDF("text")
    // composed reference: sum (h % 1001 - 500) over the distinct unigram
    // and bigram hash sets independently (no cross-set dedup), count both
    def score(c: Column): Column = aggregate(c, lit(0L),
      (acc, h) => acc + (h % 1001) - 500)
    val slow = array(
      score(composedShingles(col("text"), 1)) + score(composedShingles(col("text"), 2)),
      (size(composedShingles(col("text"), 1)) +
        size(composedShingles(col("text"), 2))).cast("long"))
    val mismatches = df.select(
        HashedLinearScore(col("text"), 1001).as("fast"), slow.as("slow"))
      .filter(not(col("fast") === col("slow")))
      .count()
    assert(mismatches == 0)
  }

  /** Independent CDC reference: sliding-window grams, cut set, slice. */
  private def naiveCdc(text: String, w: Int, d: Int): Seq[String] = {
    val toks = text.split(" ", -1).toIndexedSeq
    val cuts = toks.sliding(w).zipWithIndex
      .collect { case (g, i) if g.size == w &&
        PolyHash.hash(g.mkString(" ")) % d == 0 => i + w }
      .toSet
    val out = Seq.newBuilder[String]
    var start = 0
    for (p <- 1 to toks.length)
      if (p == toks.length || cuts.contains(p)) {
        out += toks.slice(start, p).mkString(" ")
        start = p
      }
    out.result()
  }

  test("CdcChunkStrings ≡ independent sliding-window reference; chunks partition the text") {
    import spark.implicits._
    val texts = corpus(83, 300)
    val got = texts.toDF("text")
      .select(col("text"), CdcChunkStrings(col("text"), 3, 8).as("chunks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    texts.foreach { t =>
      assert(got(t) == naiveCdc(t, 3, 8), s"mismatch on ${t.take(60)}")
      assert(got(t).mkString(" ") == t, "chunks must rejoin to the text")
    }
  }

  test("degenerate inputs: short text → empty array, never null") {
    import spark.implicits._
    val rows = Seq("", "ab", "a b").toDF("text")
      .select(CharNgramHashes(col("text"), 3).as("c"),
        WordShingleHashes(col("text"), 3).as("w"))
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1))
    }
    assert(rows(0).getSeq[Long](0).isEmpty && rows(0).getSeq[Long](1).isEmpty)
  }
}
