package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqOpsSpec extends AnyFunSuite with SparkTestSession {

  private def arr(xs: Long*) = new GenericArrayData(xs.toArray)

  test("encode picks the integer-L2 argmin per subspace, smallest id on ties") {
    // 2 subspaces × 2 dims, 3 sub-centroids each
    val cb = Array(
      Array(Array(0L, 0L), Array(10L, 10L), Array(10L, 10L)), // 1 and 2 tie
      Array(Array(5L, 5L), Array(-5L, -5L), Array(0L, 0L)))
    val codes = PqOps.encode(arr(9L, 9L, -4L, -4L), cb)
    // subspace 0: (9,9) nearer (10,10); ids 1/2 tie → 1
    // subspace 1: (-4,-4) nearest (-5,-5) → 1
    assert(codes.toLongArray().toSeq == Seq(1L, 1L))
    // a mis-dimensioned vector fails fast, never encodes garbage
    intercept[ArithmeticException] { PqOps.encode(arr(1L, 2L, 3L), cb) }
  }

  test("adc sums the per-subspace table lookups; corrupt codes fail fast") {
    val tab = Array(Array(7L, 11L), Array(100L, 200L))
    assert(PqOps.adc(arr(1L, 0L), tab) == 111L)
    intercept[ArithmeticException] { PqOps.adc(arr(1L), tab) }
    intercept[ArithmeticException] { PqOps.adc(arr(1L, 5L), tab) }
  }

  test("codegen'd PqEncode/PqAdc over a DataFrame match the driver-side math") {
    import spark.implicits._
    val cb: Seq[Seq[Seq[Long]]] = Seq(
      Seq(Seq(0L, 0L), Seq(8L, 8L)),
      Seq(Seq(1L, -1L), Seq(-6L, 6L)))
    val vecs = Seq(
      (1L, Seq(7L, 9L, -5L, 5L)),
      (2L, Seq(1L, -1L, 2L, 0L)))
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def enc(v: Seq[Long]): Seq[Long] = (0 until 2).map { m =>
      val sub = v.slice(m * 2, m * 2 + 2)
      cb(m).zipWithIndex.minBy { case (c, i) => (l2(sub, c), i) }._2.toLong
    }
    val tab: Seq[Seq[Long]] = cb.map(_.map(c => l2(Seq(0L, 0L), c)))
    val got = vecs.toDF("id", "qe")
      .select(col("id"), PqEncode(col("qe"), cb).as("codes"))
      .select(col("id"), col("codes"), PqAdc(col("codes"), tab).as("adc"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val want = vecs.map { case (id, v) =>
      val c = enc(v)
      (id, c, c.zipWithIndex.map { case (code, m) => tab(m)(code.toInt) }.sum)
    }
    assert(got == want)
  }
}
