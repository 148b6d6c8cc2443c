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

  test("q227 bounds multi-assignment candidate volume within 2·N·SemGroup") {
    val d = "/root/testdata/sf0.01"
    val cents = Similarity.ensureTrained(spark, d)
    val v = spark.table(Similarity.ensureClustered(spark, d))
    val out = Retrieval.qSemDedupMulti.build(spark, d)
    val bad = out.queryExecution.executedPlan.collect {
      case j: CartesianProductExec => j
      case j: BroadcastNestedLoopJoinExec => j
    }
    assert(bad.isEmpty, s"q227 plan contains a non-equi pair join:\n$bad")
    val n = v.count()
    val assign = Retrieval.semMultiAssign(spark.table(
        Similarity.ensureClustered(spark, d)), cents, Retrieval.SemGroup)
      .select(col("vec_id"), col("acid"), col("sub")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // exactly 2 assignments per vector, to 2 DISTINCT centroids
    assert(assign.length.toLong == 2L * n)
    assign.groupBy(_._1).values.foreach { a =>
      assert(a.map(_._2).distinct.length == 2,
        s"vector ${a.head._1} not assigned to 2 distinct centroids")
    }
    val groupVol = assign.groupBy(r => (r._2, r._3)).values
      .map(g => { val k = g.size.toLong; k * (k - 1) / 2 }).sum
    assert(groupVol <= 2L * n * Retrieval.SemGroup,
      s"multi candidate volume $groupVol exceeds 2·N·SemGroup = ${2L * n * Retrieval.SemGroup}")
    // report-level consistency: every vector once, kept ⇔ self-exemplar
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (id, ex, kept) =>
      assert((kept == 1L) == (ex == id), s"kept flag inconsistent for $id")
      assert(ex <= id, s"exemplar must never have a higher id ($id -> $ex)")
    }
  }

  test("q227 removals are a strict superset of q137's on a forced boundary pair") {
    import spark.implicits._
    // 3 centroids on the axes; vectors 3/4 are a near-dup pair straddling
    // the c0/c1 boundary (each the other's runner-up cell) — invisible to
    // any within-primary-cell pass, caught by the 2-nearest assignment.
    val cents: Seq[Seq[Long]] =
      Seq(Seq(10000L, 0L, 0L), Seq(0L, 10000L, 0L), Seq(0L, 0L, 10000L))
    val v = Seq(
      (1L, 0, Seq(9950L, 100L, 0L)),
      (2L, 0, Seq(9950L, 120L, 0L)), //   same-cell dup of 1
      (3L, 0, Seq(7400L, 6700L, 0L)), //  boundary pair, primary c0
      (4L, 1, Seq(6700L, 7400L, 0L)), //  boundary pair, primary c1
      (5L, 2, Seq(0L, 100L, 9900L)),
      (6L, 2, Seq(100L, 0L, 9950L))) //   same-cell dup of 5
      .toDF("vec_id", "cid", "qe")
    def removals(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("kept") === 0L).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet
    val bounded = removals(
      Retrieval.semDedupBoundedFrom(v, Retrieval.SemGroup))
    val multi = removals(
      Retrieval.semDedupMultiFrom(v, cents, Retrieval.SemGroup))
    assert(bounded.subsetOf(multi),
      s"multi removals $multi must contain bounded removals $bounded")
    assert(multi.contains(4L) && !bounded.contains(4L),
      s"the forced boundary doc 4 must be removed ONLY by q227 " +
        s"(bounded=$bounded, multi=$multi)")
    assert(bounded.nonEmpty, "bounded pass removed nothing — vacuous")
    // the boundary doc's exemplar is its cross-cell near-dup's exemplar
    // chain head (doc 1 ≥ τ of doc 4 within the shared cell)
    val ex4 = Retrieval.semDedupMultiFrom(v, cents, Retrieval.SemGroup)
      .filter(col("vec_id") === 4L).select(col("exemplar_id"))
      .head().getLong(0)
    assert(ex4 < 4L, s"boundary doc exemplar must be a lower id, got $ex4")
  }

  test("q228 boundary report is consistent with its two inputs") {
    val d = "/root/testdata/sf0.01"
    val r = Retrieval.qSemDedupBoundary.build(spark, d).head()
    val nVecs = r.getLong(0)
    val nExact = r.getLong(1); val nMulti = r.getLong(2)
    val nAgree = r.getLong(3); val nExtra = r.getLong(4)
    val nMissed = r.getLong(5)
    assert(nVecs > 0L)
    assert(nAgree + nMissed == nExact,
      "exact removals must split into agreed + missed-by-bound")
    assert(nAgree + nExtra == nMulti,
      "multi removals must split into agreed + boundary-extra")
    assert(r.getLong(6) == nAgree * 1000000L / nExact)
  }

  test("q229 margin histogram covers every vector with sane buckets, map-side only") {
    val d = "/root/testdata/sf0.01"
    Similarity.ensureTrained(spark, d)
    val table = Similarity.ensureClustered(spark, d)
    val out = Retrieval.qCentroidMargin.build(spark, d)
    // no joins of any kind — the codebook rides as literals
    val joins = out.queryExecution.executedPlan.collect {
      case j if j.nodeName.contains("Join") => j
    }
    assert(joins.isEmpty, s"q229 must be join-free:\n$joins")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).sum == spark.table(table).count(),
      "histogram must cover every vector exactly once")
    // margin = cos1 - cos2 ∈ [0, 2] → bucket ∈ [0, 40]
    assert(rows.forall { case (b, _) => b >= 0L && b <= 40L },
      s"bucket out of range: ${rows.toSeq}")
    assert(rows.length > 1, "degenerate histogram — margin never varies")
  }

  test("q230 yield curve is monotone and agrees with q137 at the shipped τ") {
    val d = "/root/testdata/sf0.01"
    Similarity.ensureTrained(spark, d)
    val rows = Retrieval.qSemDedupYield.build(spark, d).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Retrieval.YieldTaus,
      "every grid τ must appear exactly once")
    // removals monotone non-increasing in τ; yield the mirror image
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 >= hi._2, s"removals must not grow with τ: $lo -> $hi")
      assert(lo._4 <= hi._4, s"yield must not shrink with τ: $lo -> $hi")
    }
    // the curve must actually vary on the gate corpus (else it gates nothing)
    assert(rows.head._2 > rows.last._2, "flat curve — τ grid never bites")
    // consistency with the gated q137 at the shipped τ = 0.3: identical
    // candidate surface, identical cosine, so identical removal count
    val q137Removed = Retrieval.qSemDedupBounded.build(spark, d)
      .filter(col("kept") === 0L).count()
    val at03 = rows.find(_._1 == Retrieval.SemTau).get
    assert(at03._2 == q137Removed,
      s"yield curve at τ=0.3 says ${at03._2} removed; q137 says $q137Removed")
    // yield_e6 recomputes from the counts exactly
    rows.foreach { case (_, rm, n, y) =>
      assert(y == (n - rm) * 1000000L / n)
    }
  }

  test("q231 collapses exactly the q227 pair graph: labels, keepers, chains") {
    val d = "/root/testdata/sf0.01"
    val cents = Similarity.ensureTrained(spark, d)
    val v = spark.table(Similarity.ensureClustered(spark, d))
    val rows = Retrieval.qSemDedupCc.build(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (id, compId, kept) =>
      assert((kept == 1L) == (compId == id), s"kept flag inconsistent for $id")
      assert(compId <= id, s"component label above member id ($id -> $compId)")
    }
    // the label IS the component minimum
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._1).min == c,
        s"component $c labeled above its min member")
    }
    // every qualifying pair's endpoints share a component (transitivity)
    val comp = rows.map(r => r._1 -> r._2).toMap
    val pairs = Retrieval.semMultiPairs(v, cents, Retrieval.SemGroup)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no qualifying pairs — vacuous")
    pairs.foreach { case (u, w) =>
      assert(comp(u) == comp(w), s"pair ($u, $w) split across components")
    }
    // q227 removals ⊆ q231 removals (a vector with a lower direct
    // neighbor is never its component minimum), and the gate corpus
    // actually exhibits the chain effect q231 exists to close
    val multiRemoved = Retrieval.qSemDedupMulti.build(spark, d)
      .filter(col("kept") === 0L).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val ccRemoved = rows.filter(_._3 == 0L).map(_._1).toSet
    assert(multiRemoved.subsetOf(ccRemoved),
      "a q227 removal survived the transitive collapse")
    assert(ccRemoved.size > multiRemoved.size,
      "no chain-extra removals on the gate corpus — the collapse gates nothing")
  }

  test("q232 agreement report is consistent with its two inputs") {
    val d = "/root/testdata/sf0.01"
    val r = Retrieval.qSemDedupCcAgreement.build(spark, d).head()
    val nVecs = r.getLong(0)
    val nMulti = r.getLong(1); val nCc = r.getLong(2)
    val nChain = r.getLong(3); val nOnly = r.getLong(4)
    val nDangling = r.getLong(5)
    assert(nVecs > 0L && nCc > 0L)
    assert(nOnly == 0L, "a q227 removal must never be a component minimum")
    assert(nCc == nMulti + nChain,
      "cc removals must split into multi removals + chain extras")
    assert(nDangling <= nMulti)
    assert(r.getLong(6) == nMulti * 1000000L / nCc)
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
