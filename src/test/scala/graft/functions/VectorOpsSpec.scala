package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** [[Quantize]]/[[QDot]] must be drop-in equivalent to the composed
  * higher-order-function forms they replaced (kept here as the
  * executable spec), including the round-half-up rounding mode and the
  * degenerate-input NULL guard.
  */
class VectorOpsSpec extends AnyFunSuite with SparkTestSession {

  private def composedQuantize(a: Column): Column =
    transform(a, x => round(x.cast(DoubleType) * 1000000.0d).cast(LongType))

  private def composedQdot(qa: Column, qb: Column): Column =
    when(size(qa) === size(qb) && size(qa) > 0,
      aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, v) => acc + v))
      .otherwise(lit(null).cast(LongType))

  test("Quantize ≡ composed round/cast transform on seeded random floats") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = (1 to 200).map(_ =>
      Seq.fill(rnd.nextInt(70))((rnd.nextFloat() - 0.5f) * 2f))
    val mismatches = vecs.toDF("v").select(
        Quantize(col("v")).as("fast"), composedQuantize(col("v")).as("slow"))
      .filter(not(col("fast") === col("slow"))).count()
    assert(mismatches == 0)
  }

  test("Quantize rounds half away from zero exactly like Spark round()") {
    import spark.implicits._
    // 0.0000005 * 1e6 = 0.5 → 1; -0.0000015 * 1e6 = -1.5 → -2 (HALF_UP)
    val got = Seq(Seq(0.0000005d, -0.0000015d, 0.0000024d)).toDF("v")
      .select(Quantize(col("v"))).as[Seq[Long]].head()
    assert(got == Seq(1L, -2L, 2L))
  }

  test("Quantize propagates null elements exactly like the composed form") {
    import spark.implicits._
    val df = Seq(
      Seq[Option[Double]](Some(0.5d), None, Some(-1.25d)),
      Seq[Option[Double]](None),
      Seq[Option[Double]](Some(2.0d))).toDF("v")
    val rows = df.select(
        Quantize(col("v")).as("fast"), composedQuantize(col("v")).as("slow"))
      .as[(Seq[Option[Long]], Seq[Option[Long]])].collect()
    rows.foreach { case (fast, slow) => assert(fast == slow) }
    assert(rows(0)._1 == Seq(Some(500000L), None, Some(-1250000L)))
  }

  test("QDot ≡ composed aggregate/zip_with incl. NULL guard") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 200).map { _ =>
      val n = rnd.nextInt(8)
      val m = if (rnd.nextInt(4) == 0) rnd.nextInt(8) else n // 25% mismatched
      (Seq.fill(n)(rnd.nextLong() % 1000000L), Seq.fill(m)(rnd.nextLong() % 1000000L))
    }
    val df = pairs.toDF("a", "b")
    val rows = df.select(
        QDot(col("a"), col("b")).as("fast"),
        composedQdot(col("a"), col("b")).as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("QDot propagates null inputs") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(df.select(QDot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("QDot over a null ELEMENT is NULL, matching the composed form") {
    import spark.implicits._
    // a null slot must null the whole product (the composed fold's
    // acc + x*y over NULL), never silently read as 0
    val df = Seq(
      (Seq[Option[Long]](Some(3L), None), Seq[Option[Long]](Some(4L), Some(5L))),
      (Seq[Option[Long]](Some(3L), Some(2L)), Seq[Option[Long]](None, Some(5L))),
      (Seq[Option[Long]](Some(3L), Some(2L)), Seq[Option[Long]](Some(4L), Some(5L))))
      .toDF("a", "b")
    val rows = df.select(
        QDot(col("a"), col("b")).as("fast"),
        composedQdot(col("a"), col("b")).as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"fast/slow null disagree: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(2).getLong(0) == 22L)
  }

  test("NearestCentroid over a null element is NULL (not a 0-coordinate assignment)") {
    import spark.implicits._
    val cents = Seq(Seq(1000000L, 0L), Seq(0L, 1000000L))
    val df = Seq(
      Seq[Option[Long]](Some(900000L), None),
      Seq[Option[Long]](Some(900000L), Some(100000L))).toDF("q")
    val rows = df.select(NearestCentroid(col("q"), cents)).collect()
    assert(rows(0).isNullAt(0), "null slot must yield NULL assignment")
    assert(rows(1).getInt(0) == 0)
  }

  test("ProbeCentroids: nprobe=1 prefix ≡ NearestCentroid; full ranking ≡ driver sort") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val K = 8
    val dim = 6
    val cents: Seq[Seq[Long]] =
      Seq.fill(K)(Seq.fill(dim)(rnd.nextLong() % 1000000L))
    val vecs = (1 to 300).map(_ => Seq.fill(dim)(rnd.nextLong() % 1000000L))
      .filter(_.exists(_ != 0L))
    // the ONE probe-order definition, driver-side (Similarity's
    // rankedCentroids arithmetic restated)
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    def ranked(q: Seq[Long]): Seq[Int] = {
      val qn = math.sqrt(dot(q, q).toDouble)
      cents.zipWithIndex.map { case (c, i) =>
        (i, dot(c, q).toDouble / (math.sqrt(dot(c, c).toDouble) * qn))
      }.sortBy { case (i, c) => (-c, i) }.map(_._1)
    }
    val rows = vecs.toDF("q").select(
        ProbeCentroids(col("q"), cents, K).as("full"),
        ProbeCentroids(col("q"), cents, 2).as("p2"),
        NearestCentroid(col("q"), cents).as("nc"),
        col("q"))
      .as[(Seq[Int], Seq[Int], Int, Seq[Long])].collect()
    rows.foreach { case (full, p2, nc, q) =>
      val expect = ranked(q)
      assert(full == expect, s"full ranking diverges for $q")
      assert(p2 == expect.take(2), "nprobe=2 must be the ranking prefix")
      assert(full.head == nc, "rank-1 must equal the NearestCentroid argmax")
    }
  }

  test("ProbeCentroids null/zero handling matches NearestCentroid") {
    import spark.implicits._
    val cents = Seq(Seq(1000000L, 0L), Seq(0L, 1000000L))
    val rows = Seq(Seq[Option[Long]](Some(900000L), None)).toDF("q")
      .select(ProbeCentroids(col("q"), cents, 2)).collect()
    assert(rows(0).isNullAt(0), "null slot must yield NULL probe set")
    val e = intercept[Exception] {
      Seq(Seq(0L, 0L)).toDF("q")
        .select(ProbeCentroids(col("q"), cents, 2)).collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(messages.exists(_.contains("zero vector")),
      s"expected a zero-vector diagnostic, got: $messages")
  }

  test("NearestCentroid of a zero vector fails fast (cosine undefined)") {
    import spark.implicits._
    // every cosine against a zero vector is NaN: a silent -1 assignment
    // would drop the row from gated queries while the oracle keeps it
    val cents = Seq(Seq(1000000L, 0L), Seq(0L, 1000000L))
    val e = intercept[Exception] {
      Seq(Seq(0L, 0L)).toDF("q")
        .select(NearestCentroid(col("q"), cents)).collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(messages.exists(_.contains("zero vector")),
      s"expected a zero-vector diagnostic, got: $messages")
  }
}
