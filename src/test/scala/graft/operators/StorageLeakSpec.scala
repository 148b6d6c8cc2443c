package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-6 storage-leak fix: iterative operators must keep at
  * most ONE generation of intermediate state pinned in storage memory.
  * Round 5's q50 leaked every localCheckpoint generation for the JVM
  * lifetime, which regressed an unrelated query's bench time 4.4× via
  * storage pressure — this spec fails if that shape ever comes back.
  */
class StorageLeakSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q50 label propagation pins at most one generation after materializing") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val result = Dedup.qDupClusters.build(spark, dir)
    assert(result.count() > 0)
    val pinnedAfter = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    // the converged generation legitimately backs the returned plan;
    // superseded generations and the pairs/edges scaffolding must be gone
    assert(pinnedAfter.size <= 1,
      s"q50 left ${pinnedAfter.size} RDDs pinned (expected <= 1 — the " +
        s"converged labels): ${pinnedAfter.values.map(_.name).mkString(", ")}")
  }
}
