package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A NULL element in the input array must propagate to a NULL
  * signature/band result (not silently read as hash 0, which would bias
  * signatures toward colliding on degenerate inputs) — through BOTH the
  * interpreted eval path and whole-stage codegen.
  */
class MinHashNullSpec extends AnyFunSuite with SparkTestSession {

  private def cases = {
    import spark.implicits._
    Seq(
      (1L, Seq[java.lang.Long](10L, 20L, 30L, 40L)),
      (2L, Seq[java.lang.Long](10L, null, 30L, 40L)),
      (3L, Seq[java.lang.Long]()))
      .toDF("id", "hs")
  }

  test("MinHashSig: null element → NULL signature; empty array → all-P") {
    val rows = cases
      .select(col("id"), MinHashSig(col("hs"), 8).as("sig"))
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(1), "clean input must sign")
    assert(rows(1).isNullAt(1), "null element must propagate to NULL")
    assert(rows(2).getSeq[Long](1).forall(_ == MinHash.P),
      "empty shingle set signs as P in every coordinate")
  }

  test("BandHashes: null element → NULL result; codegen and eval agree") {
    val withSig = cases
      .select(col("id"), MinHashSig(col("hs"), 8).as("sig"))
    val banded = withSig.select(col("id"), BandHashes(col("sig"), 4).as("bh"))
      .orderBy("id").collect()
    assert(!banded(0).isNullAt(1) && !banded(2).isNullAt(1))
    assert(banded(1).isNullAt(1), "NULL signature must band to NULL")

    // force the interpreted path too (codegen off) and compare
    val old = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = withSig.select(col("id"), BandHashes(col("sig"), 4).as("bh"))
        .orderBy("id").collect()
      assert(interp.map(_.toString).toSeq == banded.map(_.toString).toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", old)
  }
}
