package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic laws of the sketch/statistics queries that the oracle's
  * value-equality can't express on its own:
  *  - a count-min estimate can only ever OVERcount (q84) — the one-sided
  *    error bound that makes CMS usable for threshold filters;
  *  - lift agrees with its defining integer counts recomputed
  *    independently from the raw result row (q83).
  */
class SketchLawsSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q84: CMS estimates never undercount, probes cover the top-10") {
    val rows = Corpus.qCountMin.build(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"CMS undercounted ${r.getAs[String]("term")}")
      assert(r.getAs[Long]("est_cnt") ==
        r.getAs[Long]("true_cnt") + r.getAs[Long]("overcount"))
    }
  }

  test("q85: the Bloom probe never misses (no false negatives, fp >= 0)") {
    val rows = Corpus.qBloomDecontaminate.build(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("fp_grams") >= 0L,
        s"bloom missed a contaminated gram in doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("bloom_hits") <= r.getAs[Long]("n_grams"))
    }
    // the corpus is seeded with real contamination: the exact join must
    // find some, and the bloom must cover every one of those docs
    assert(rows.map(_.getAs[Long]("exact_hits")).sum > 0)
  }

  test("q92: pair yield is non-increasing in the threshold and anchored at q23") {
    val rows = Dedup.qDedupThresholdCurve.build(spark, dir).collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("n_pairs")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    rows.sliding(2).foreach { case Array((t1, n1), (t2, n2)) =>
      assert(n1 >= n2, s"yield rose from $t1 ($n1) to $t2 ($n2)")
    }
    // the 0.7 row IS q23's policy: its count must equal the q23 pair count
    val q23 = Dedup.qLshPairs.build(spark, dir).count()
    assert(rows.toMap.apply(0.7) == q23)
  }

  test("q83: lift equals c_ab*N/(c_a*c_b) for the reported counts") {
    // N is not an output column: recover it from any row's lift (the
    // products are exact doubles at this scale), then check every row
    // agrees on the same integer N
    val rows = Corpus.qCollocations.build(spark, dir).collect()
    assert(rows.nonEmpty)
    val ns = rows.map { r =>
      val lift = r.getAs[Double]("lift")
      math.round(lift * r.getAs[Long]("c_a") * r.getAs[Long]("c_b") /
        r.getAs[Long]("c_ab"))
    }
    assert(ns.distinct.length == 1, s"inconsistent implied N: ${ns.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("c_ab") >= 5L)
      val expect = r.getAs[Long]("c_ab").toDouble * ns.head /
        (r.getAs[Long]("c_a").toDouble * r.getAs[Long]("c_b").toDouble)
      assert(r.getAs[Double]("lift") == expect)
    }
  }
}
