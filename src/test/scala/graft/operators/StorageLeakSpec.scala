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

  test("pointer jumping converges a 64-node chain in O(log d) iterations") {
    import spark.implicits._
    // a path graph of diameter 63: plain min-label propagation needs 63
    // rounds (and would blow the iteration cap); path-halving must land
    // the whole chain on label 0 in ~log2(63) + a couple
    val edges = (0L until 63L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("u", "v")
    val (labels, iters) = Dedup.connectedComponents(spark, edges)
    assert(labels.select("cluster_id").distinct().as[Long].collect().toSeq
      == Seq(0L), "every node must collapse to the component minimum")
    assert(labels.count() == 64)
    assert(iters <= 10, s"expected O(log 63) ~ <=10 iterations, took $iters")
  }

  test("connectedComponents matches a union-find model on random graphs") {
    import spark.implicits._
    // The oracle gates one instance (the LSH pair graph); this pins the
    // algorithm itself — propagation + pointer jumping — against a
    // driver-side union-find over random graphs with varied shapes.
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 10 + rnd.nextInt(20)
      val m = 5 + rnd.nextInt(2 * n)
      val pairs = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n.toLong.toInt)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(u => u -> find(u.toInt).toLong).toMap
      val edges = (pairs ++ pairs.map(_.swap)).toDF("u", "v")
      val (labels, _) = Dedup.connectedComponents(spark, edges)
      val got = labels.as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial (n=$n m=$m): $got vs $expected")
    }
  }

  test("q50 label propagation pins nothing after materializing") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val result = Dedup.qDupClusters.build(spark, dir)
    assert(result.count() > 0)
    val pinnedAfter = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    // the converged generation is flushed to scratch parquet and
    // released inside connectedComponents; superseded generations and
    // the pairs/edges scaffolding must be gone too
    assert(pinnedAfter.isEmpty,
      s"q50 left ${pinnedAfter.size} RDDs pinned (expected 0): " +
        pinnedAfter.values.map(_.name).mkString(", "))
  }
}
