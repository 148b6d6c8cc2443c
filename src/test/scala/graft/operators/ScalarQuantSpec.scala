package graft.operators

import graft.{SparkTestSession, Tables}
import graft.functions.{Exact, SqEncode, SqOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SQ8 kernel: the codegen'd [[graft.functions.SqEncode]] must
  * agree with its driver-side twin [[graft.functions.SqOps.encodeLocal]]
  * row-for-row on the real corpus (the query vector is encoded by the
  * twin, so a divergence would silently skew every code distance), codes
  * must stay in [0, 255], and the clamp/degenerate-span edges must hold
  * for out-of-range inputs (streamed vectors outside the trained
  * bounds).
  */
class ScalarQuantSpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.01"

  test("SqEncode ≡ encodeLocal on the corpus; codes bounded") {
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val (mins, spans) = ScalarQuant.ensureBounds(spark, dir)
    val rows = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        Exact.quantize(col("embedding")).as("qe"),
        SqEncode(Exact.quantize(col("embedding")), mins, spans).as("c8"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qe = r.getSeq[Long](1)
      val c8 = r.getSeq[Long](2)
      assert(c8 == SqOps.encodeLocal(qe, mins.toArray, spans.toArray),
        s"vec ${r.getLong(0)} diverges from the driver twin")
      assert(c8.forall(c => c >= 0L && c <= 255L))
    }
    // the grid is actually exercised end to end: some dim hits both rails
    val all = rows.map(_.getSeq[Long](2))
    assert(all.exists(_.contains(0L)) && all.exists(_.contains(255L)))
  }

  test("clamp and degenerate-span edges") {
    val mins = Array(0L, 100L, 5L)
    val spans = Array(1000L, 0L, 10L)
    // below min → 0; degenerate span → 0; above max → 255
    assert(SqOps.encodeLocal(Seq(-50L, 999L, 1000L), mins, spans) ==
      Seq(0L, 0L, 255L))
    // exact rails: v = min → 0, v = max → 255
    assert(SqOps.encodeLocal(Seq(0L, 100L, 15L), mins, spans) ==
      Seq(0L, 0L, 255L))
  }
}
