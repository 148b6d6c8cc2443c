package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins q153's PROPAGATION branch, which the synthetic sf corpora leave
  * data-dead (every tainted doc there is also a direct hit): a short
  * train doc with NO 5-grams at all (4 words) can never be a direct
  * benchmark hit, but as an exact LSH twin of an eval doc it must
  * inherit taint through its cluster — the contamination-through-
  * duplicates case the operator exists for.
  */
class TaintPropagationSpec extends AnyFunSuite with SparkTestSession {
  import org.apache.spark.sql.functions._

  test("a gram-invisible near-dup of an eval doc is tainted, not direct") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-taint-").toString
    // doc 10: eval (%10==0), 4 words — twin of train doc 11 (identical
    //   text ⇒ identical MinHash bands ⇒ LSH pair ⇒ one cluster), and
    //   4 words ⇒ ZERO 5-grams on either side ⇒ doc 11 cannot be a
    //   direct hit. doc 3: classic direct hit (shares 5-grams with eval
    //   doc 20). doc 1: clean singleton.
    val docs = Seq(
      (10L, "alpha beta gamma delta", "en", "src0", 22L),
      (11L, "alpha beta gamma delta", "en", "src1", 22L),
      (20L, "pe qu ar es te un ve", "en", "src0", 20L),
      (3L, "pe qu ar es te un extraone extratwo", "en", "src1", 35L),
      (1L, "lone words that match nothing else here", "en", "src2", 39L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Dedup.qTaintPropagation.build(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // train docs only (evals 10/20 excluded from the report)
    assert(out.keySet == Set(11L, 3L, 1L))
    assert(out(11L) == ((0L, 1L)),
      "the gram-invisible twin must be tainted WITHOUT a direct hit")
    assert(out(3L) == ((1L, 1L)), "5-gram sharer must be a direct hit")
    assert(out(1L) == ((0L, 0L)), "the singleton must stay clean")
  }
}
