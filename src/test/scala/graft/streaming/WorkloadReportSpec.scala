package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Diff laws of the desired-vs-running report (SURVEY §5.3), checked over
  * seeded random workload sets.
  */
class WorkloadReportSpec extends AnyFunSuite {

  private def w(n: Int) = Workload(s"w$n", s"topic-$n", 2)

  test("diff laws: starts/stops are disjoint and reconstruct the sets") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val requested = (0 until rnd.nextInt(20)).map(_ => w(rnd.nextInt(30))).toSet
      val existing = (0 until rnd.nextInt(20)).map(_ => s"w${rnd.nextInt(30)}").toSet
      val rep = WorkloadReport(requested, existing)
      val starts = rep.workloadsToStart.map(_.workloadName)
      val stops = rep.workloadsToDelete
      assert(starts.intersect(existing).isEmpty, "never start a running workload")
      assert(stops.intersect(requested.map(_.workloadName)).isEmpty,
        "never stop a requested workload")
      assert(starts.union(existing.diff(stops)) == requested.map(_.workloadName)
        .union(existing.diff(stops)), "starts cover exactly the missing ones")
      assert(existing.diff(stops).subsetOf(requested.map(_.workloadName)),
        "whatever survives was requested")
    }
  }

  test("workload equality is by name only (reference :36-41)") {
    assert(Workload("a", "t1", 1) == Workload("a", "t2", 9))
    assert(Set(Workload("a", "t1", 1), Workload("a", "t2", 9)).size == 1)
  }
}
