package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the serving-side retrieval composites:
  *
  *  - q133 RRF: the fused list draws ONLY from the two source top-10s,
  *    and the scaled integer score is exactly Σ RrfScale/(60+rank)
  *    recomputed from the source ranks.
  *  - q134 SemDeDup: candidates come only from the cid equi-join (no
  *    cartesian/nested-loop anywhere in the plan), candidate volume is
  *    exactly Σ_c C(n_c, 2) — the cluster bound that makes the pass
  *    scale — and the keep-first-by-index rule is internally
  *    consistent (kept ⇔ exemplar is self; exemplar always a lower id
  *    in the same cluster at cosine ≥ τ).
  */
class RetrievalFusionSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q133 fuses exactly the two source top-10s with exact integer RRF") {
    val lex = Corpus.qBm25TopK.build(spark, dir).collect()
      .map(_.getLong(0)).toSeq
    val den = Similarity.qAnnPruned.build(spark, dir).collect()
      .map(_.getLong(0)).toSeq
    val fused = Retrieval.qHybridRrf.build(spark, dir).collect()
    assert(fused.length == 10)
    val ranksLex = lex.zipWithIndex.toMap
    val ranksDen = den.zipWithIndex.toMap
    fused.foreach { r =>
      val id = r.getLong(0)
      assert(ranksLex.contains(id) || ranksDen.contains(id),
        s"fused doc $id is in neither source list")
      val lexR = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val denR = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lexR == ranksLex.get(id).map(_ + 1L), s"lex_rank wrong for $id")
      assert(denR == ranksDen.get(id).map(_ + 1L), s"dense_rank wrong for $id")
      val expect = lexR.map(k => Retrieval.RrfScale / (Retrieval.RrfK + k))
        .getOrElse(0L) +
        denR.map(k => Retrieval.RrfScale / (Retrieval.RrfK + k)).getOrElse(0L)
      assert(r.getLong(3) == expect, s"rrf_scaled wrong for $id")
    }
    // descending, doc_id-tiebroken
    val keys = fused.map(r => (-r.getLong(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "fused order must be (rrf desc, doc_id)")
  }

  test("q134 candidates only from the cid equi-join, volume = Σ C(n_c, 2)") {
    Similarity.ensureTrained(spark, dir)
    val table = Similarity.ensureClustered(spark, dir)
    val out = Retrieval.qSemDedup.build(spark, dir)
    val bad = out.queryExecution.executedPlan.collect {
      case j: CartesianProductExec => j
      case j: BroadcastNestedLoopJoinExec => j
    }
    assert(bad.isEmpty, s"q134 plan contains a non-equi pair join:\n$bad")

    // the PRE-threshold candidate set the equi-join generates
    val v = spark.table(table)
    val candVolume = v.alias("a").join(v.alias("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .count()
    val expected = v.groupBy(col("cid")).count().collect()
      .map(r => { val n = r.getLong(1); n * (n - 1) / 2 }).sum
    assert(candVolume == expected,
      s"candidate volume $candVolume != Σ C(n_c,2) = $expected")
  }

  test("q137 bounds candidate volume and matches q134 on unsplit clusters") {
    // sf0.01: n_c ≈ 25 > SemGroup, so the subgroup split is actually
    // exercised (sf0.001's clusters are all below the group bound)
    val d = "/root/testdata/sf0.01"
    Similarity.ensureTrained(spark, d)
    Similarity.ensureClustered(spark, d)
    val out = Retrieval.qSemDedupBounded.build(spark, d)
    val bad = out.queryExecution.executedPlan.collect {
      case j: CartesianProductExec => j
      case j: BroadcastNestedLoopJoinExec => j
    }
    assert(bad.isEmpty, s"q137 plan contains a non-equi pair join:\n$bad")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val n = rows.length.toLong
    // every vector exactly once, and at least one cluster actually split
    assert(rows.map(_._1).distinct.length.toLong == n)
    assert(rows.exists(_._3 > 0L), "no cluster split — the bound is untested")
    // candidate volume: Σ C(group, 2) over (cid, sub) stays within the
    // linear envelope N·SemGroup (the hash split is uneven but bounded),
    // and strictly below the unsplit Σ C(n_c, 2)
    val groupVol = rows.groupBy(r => (r._2, r._3)).values
      .map(g => { val k = g.size.toLong; k * (k - 1) / 2 }).sum
    val clusterVol = rows.groupBy(_._2).values
      .map(g => { val k = g.size.toLong; k * (k - 1) / 2 }).sum
    assert(groupVol <= n * Retrieval.SemGroup,
      s"bounded candidate volume $groupVol exceeds N·SemGroup = ${n * Retrieval.SemGroup}")
    assert(groupVol < clusterVol,
      "split produced no candidate reduction — bound is vacuous")
    // every removal is a same-(cid, sub) lower-id exemplar
    val meta = rows.map(r => (r._1, (r._2, r._3))).toMap
    rows.filter(_._5 == 0L).foreach { case (id, cid, sub, ex, _) =>
      assert(ex < id && meta(ex) == ((cid, sub)),
        s"exemplar $ex of $id crosses a subgroup")
    }
    // with the bound above every cluster size (m = 1 everywhere) the
    // pipeline must DEGENERATE to q134 bit-for-bit — the bound only
    // changes semantics where it actually fires
    val identity = Retrieval.semDedupBounded(spark, d, group = 1 << 20)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(identity.forall(_._2._1 == 0L),
      "an unfired bound must leave every vector in subgroup 0")
    val q134full = Retrieval.qSemDedup.build(spark, d).collect()
      .map(r => (r.getLong(0), (0L, r.getLong(2), r.getLong(3))))
    assert(identity.sortBy(_._1).toSeq == q134full.sortBy(_._1).toSeq,
      "q137 with m = 1 everywhere must be identical to q134")
  }

  test("q134 keep-first-by-index rule is internally consistent") {
    Similarity.ensureTrained(spark, dir)
    val table = Similarity.ensureClustered(spark, dir)
    val rows = Retrieval.qSemDedup.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == spark.table(table).count(),
      "every vector must appear exactly once")
    rows.foreach { case (id, _, ex, kept) =>
      assert((kept == 1L) == (ex == id), s"kept flag inconsistent for $id")
      assert(ex <= id, s"exemplar must never have a higher id ($id -> $ex)")
    }
    assert(rows.exists(_._4 == 0L),
      "corpus should contain at least one tight pair at τ (vacuous test otherwise)")
    // every removed doc's exemplar is a same-cluster lower id at ≥ τ
    val byId = rows.map(r => (r._1, r._2)).toMap
    val qe = spark.table(table).select(col("vec_id"), col("qe")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      dot / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    rows.filter(_._4 == 0L).foreach { case (id, cid, ex, _) =>
      assert(byId(ex) == cid, s"exemplar $ex of $id crosses clusters")
      assert(cos(qe(id), qe(ex)) >= Retrieval.SemTau,
        s"exemplar $ex of $id is below τ")
    }
  }
}
