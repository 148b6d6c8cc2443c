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

  test("pruned-probe results are bit-identical to the full-scan q26b probe") {
    val pruned = Similarity.qAnnPruned.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Similarity.qAnnTrained.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pruned.nonEmpty)
    assert(pruned == full)
  }
}
