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

  test("q158: Misra-Gries kernel laws (size, superset, count bounds)") {
    // deterministic adversarial-ish stream: Zipf-ish head + churning
    // tail, interleaved so decrements fire throughout
    val stream = (0 until 5000).flatMap { i =>
      Seq(s"hot${i % 3}", s"warm${i % 17}", s"tail${i % 997}")
    }
    for (k <- Seq(4, 16, 64)) {
      val (m, n) = Corpus.mgSummary(stream.iterator, k)
      assert(n == stream.length.toLong)
      assert(m.size <= k, s"k=$k summary overflowed: ${m.size}")
      val exact = stream.groupBy(identity).map { case (t, xs) =>
        (t, xs.length.toLong)
      }
      // every item with count > n/k survives (the guarantee q158's
      // candidate superset rests on)
      exact.foreach { case (t, c) =>
        if (c * k > n)
          assert(m.contains(t), s"k=$k lost heavy hitter $t (count $c)")
      }
      // stored counts are lower bounds within n/k of the truth
      m.foreach { case (t, c) =>
        assert(c <= exact(t), s"k=$k overcounted $t")
        assert(exact(t) - c <= n / k, s"k=$k undercounted $t beyond n/k")
      }
    }
  }

  test("q158: gated output is exactly the true heavy hitters with exact counts") {
    val rows = Corpus.qHeavyHitters.build(spark, dir).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("cnt"))).toMap
    val docs = graft.Tables.load(spark, dir, "documents")
    import org.apache.spark.sql.functions._
    val exact = docs
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).count().collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("count")))
    val n = exact.map(_._2).sum
    val expected = exact.filter { case (_, c) => c * Corpus.MgK > n }.toMap
    assert(rows == expected,
      s"heavy-hitter set mismatch: got ${rows.keySet}, want ${expected.keySet}")
    assert(rows.nonEmpty)
  }
}
