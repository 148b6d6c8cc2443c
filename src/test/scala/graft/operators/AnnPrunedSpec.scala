package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** The clustered-at-rest ANN layout (q26c): the probe must read ONLY the
  * probed clusters' partitions — partition pruning is the whole point of
  * persisting IVF assignments as a partition column — and must return
  * exactly the q26b (scan-everything) result.
  */
class AnnPrunedSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("the probe scan is partition-pruned to the probed clusters") {
    val probe = Similarity.qAnnPruned.build(spark, dir)
    val scans = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec
          if s.verboseStringWithSuffix(1000).toLowerCase.contains("graft_annclu") =>
        s
    }
    assert(scans.nonEmpty, "expected a scan of the clustered layout")
    scans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        s"probe scan carries no partition filter:\n$s")
      // nprobe=2 of K=8 clusters: the executed scan must touch at most
      // 2 partition directories' files
      val selected = s.relation.location.listFiles(s.partitionFilters, Nil)
      assert(selected.size <= 2,
        s"expected <= 2 pruned partitions, scanned ${selected.size}")
    }
  }

  test("q60b sweep: every probe pruned, total partitions <= Σ nprobe, recall monotone to 1.0") {
    // the union-of-aggregates plan goes adaptive, which hides the scans
    // inside unexecuted query stages; pruning is a STATIC property of the
    // literal isin partition filters, so assert it on the non-AQE plan
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrior = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "false")
    val (sweep, scans) =
      try {
        val df = Similarity.qAnnRecallSweep.build(spark, dir)
        val ss = df.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec
              if s.verboseStringWithSuffix(1000).toLowerCase.contains("graft_annclu") =>
            s
        }
        (df, ss)
      } finally aqePrior match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None => spark.conf.unset(aqeKey)
      }
    assert(scans.size == 4, s"expected 4 probe scans, got ${scans.size}")
    scans.foreach(s => assert(s.partitionFilters.nonEmpty,
      s"sweep probe scan carries no partition filter:\n$s"))
    // each probe reads its own <= nprobe partitions; conservatively bound
    // the sum by Σ {1,2,4,8} = 15 (of 4 × K = 32 unpruned)
    val perScan = scans.map(s =>
      s.relation.location.listFiles(s.partitionFilters, Nil).size)
    assert(perScan.sum <= 15,
      s"sweep scanned ${perScan.mkString("+")} partitions, expected Σ <= 15")

    // nested probe sets → recall@10 is monotone nondecreasing, and
    // nprobe = K = 8 scans every cluster → exact top-10 → recall 1.0
    val rows = sweep.collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8))
    val recalls = rows.map(_._2).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone: $recalls")
    assert(recalls.last == 1.0, s"nprobe = K must be exact, got ${recalls.last}")
  }

  test("q166 filtered probe: partition-pruned AND the label predicate pushed to parquet") {
    val probe = Retrieval.qAnnFiltered.build(spark, dir)
    val scans = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec
          if s.verboseStringWithSuffix(1000).toLowerCase.contains("graft_annclu") =>
        s
    }
    assert(scans.nonEmpty, "expected a scan of the clustered layout")
    scans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        s"filtered probe scan carries no partition filter:\n$s")
      val selected = s.relation.location.listFiles(s.partitionFilters, Nil)
      assert(selected.size <= 2,
        s"expected <= 2 pruned partitions, scanned ${selected.size}")
      // the metadata predicate must reach the parquet reader as a data
      // filter (rowgroup stats skip non-matching groups) — NOT ride as
      // a post-scan join or a filter above the exchange
      assert(s.dataFilters.exists(_.references.exists(_.name == "label")),
        s"label predicate not pushed into the layout scan:\n$s")
    }
    // the filter actually bites: every returned row carries an allowed label
    val rows = probe.collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, l) => Retrieval.FilterLabels.contains(l) })
  }

  test("q74 IVF-PQ: codes AND rerank scans pruned; re-ranking never hurts recall") {
    // static pruning property → non-AQE plan, as in the q60b test
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrior = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "false")
    val (df, codeScans, fullScans) =
      try {
        val d = ProductQuant.qPqRecall.build(spark, dir)
        def scansOf(tag: String) = d.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec
              if s.verboseStringWithSuffix(1000).toLowerCase.contains(tag) => s
        }
        (d, scansOf("graft_pqcodes"), scansOf("graft_annclu"))
      } finally aqePrior match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None => spark.conf.unset(aqeKey)
      }
    // two scans of the codes table per sweep point (ADC top-10 + the
    // top-50 shortlist) and one of the full-vector layout (the re-rank
    // fetch) — every one partition-pruned, never a full-corpus read
    assert(codeScans.size == 8, s"expected 8 codes scans, got ${codeScans.size}")
    assert(fullScans.size == 4, s"expected 4 rerank scans, got ${fullScans.size}")
    (codeScans ++ fullScans).foreach(s => assert(s.partitionFilters.nonEmpty,
      s"IVF-PQ scan carries no partition filter:\n$s"))
    val codeParts = codeScans.map(s =>
      s.relation.location.listFiles(s.partitionFilters, Nil).size)
    val fullParts = fullScans.map(s =>
      s.relation.location.listFiles(s.partitionFilters, Nil).size)
    assert(codeParts.sum <= 30, // 2 × Σ {1,2,4,8}
      s"codes scans read ${codeParts.mkString("+")} partitions, expected Σ <= 30")
    assert(fullParts.sum <= 15,
      s"rerank scans read ${fullParts.mkString("+")} partitions, expected Σ <= 15")

    // exact re-ranking of the ADC top-50 can only help: a true positive
    // of the ADC top-10 is in the shortlist, and only candidates with
    // strictly better exact distance — themselves exact-top-10 members —
    // can displace it
    val rows = df.collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8))
    rows.foreach { case (n, adc, rr) =>
      assert(rr >= adc, s"nprobe=$n: rerank recall $rr < raw ADC recall $adc")
    }
  }

  test("pruned-probe results are bit-identical to the full-scan q26b probe") {
    val pruned = Similarity.qAnnPruned.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Similarity.qAnnTrained.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pruned.nonEmpty)
    assert(pruned == full)
  }
}
