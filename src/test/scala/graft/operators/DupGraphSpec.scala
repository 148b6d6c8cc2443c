package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the DupGraph store's per-corpus isolation: building the store
  * for a SECOND corpus dir in the same JVM must not delete the first
  * corpus's flushed parquet (round-11 finding: the scratch tag omitted
  * the corpus dir while the memo key included it, so the second build
  * flushed under the first's tag and tore down its files).
  */
class DupGraphSpec extends AnyFunSuite with graft.SparkTestSession {

  private val dirA = "/root/testdata/sf0.001"

  test("two corpus dirs in one JVM keep independent, readable stores") {
    // second corpus: same documents table under a different dir — byte
    // identical, so its graph is a known quantity equal to corpus A's
    val dirB = java.nio.file.Files.createTempDirectory("dupgraph-b").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dirA/documents.parquet"),
      java.nio.file.Paths.get(s"$dirB/documents.parquet"))

    val pairsA = DupGraph.pairs(spark, dirA).count()
    val labelsA = DupGraph.labels(spark, dirA).count()
    val pairsB = DupGraph.pairs(spark, dirB).count()
    val labelsB = DupGraph.labels(spark, dirB).count()
    assert(pairsA == pairsB)
    assert(labelsA == labelsB)

    // corpus A's memoized paths must still be READABLE after B's build —
    // before the fix this threw (B's flush deleted A's files)
    assert(DupGraph.pairs(spark, dirA).count() == pairsA)
    assert(DupGraph.edges(spark, dirA).count() == 2 * pairsA)
    assert(DupGraph.labels(spark, dirA).count() == labelsA)
    assert(DupGraph.labels(spark, dirB).count() == labelsB)
  }
}
