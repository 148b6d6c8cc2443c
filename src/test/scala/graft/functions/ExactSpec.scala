package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExactSpec extends AnyFunSuite with SparkTestSession {

  test("dsum is invariant under repartitioning (order-insensitive)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 1000 - 500)
    val df = xs.toDF("v")
    val results = Seq(1, 3, 7, 32).map { n =>
      df.repartition(n).agg(Exact.dsum(col("v"))).as[Double].head()
    }
    assert(results.distinct.size == 1,
      s"dsum varied across partitionings: $results")
  }

  test("davg equals exact decimal sum over count") {
    import spark.implicits._
    val df = Seq(1.1, 2.2, 3.3).toDF("v")
    val got = df.agg(Exact.davg(col("v"))).as[Double].head()
    val expected = (BigDecimal("1.1") + BigDecimal("2.2") + BigDecimal("3.3")).toDouble / 3
    assert(got == expected)
  }

  test("qdot: equal-length vectors produce exact integer dot") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(Exact.qdot(col("a"), col("b"))).as[Long].head() == 32L)
  }

  test("qdot: mismatched lengths and empty vectors yield NULL, not garbage") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L), Seq(1L)), // length mismatch
      (Seq.empty[Long], Seq.empty[Long])) // empty
      .toDF("a", "b")
    val got = df.select(Exact.qdot(col("a"), col("b"))).collect().map(_.isNullAt(0))
    assert(got.forall(identity))
  }

  test("cosine of identical vectors is ~1.0 and bit-stable across runs") {
    import spark.implicits._
    val v = Seq(0.25f, -0.5f, 0.125f)
    def run(): Double = Seq((v, v)).toDF("a", "b")
      .select(Exact.cosine(col("a"), col("b"))).as[Double].head()
    val got = run()
    // sqrt(d)*sqrt(d) != d exactly in IEEE — the value is deterministic
    // (same in DuckDB) but may differ from 1.0 by an ulp
    assert(math.abs(got - 1.0) < 1e-12)
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(run()))
  }
}
