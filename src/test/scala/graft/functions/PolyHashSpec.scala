package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PolyHashSpec extends AnyFunSuite with SparkTestSession {

  /** Straightforward reference fold over code points, for cross-checking
    * the production while-loop.
    */
  private def naive(s: String): Long = {
    val cps = s.codePoints().toArray
    if (cps.isEmpty) 0L
    else cps.tail.foldLeft(cps.head.toLong)((h, c) => (h * 31 + c) % PolyHash.P)
  }

  test("hash matches the naive code-point fold on seeded random ASCII") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      assert(PolyHash.hash(s) == naive(s), s"input: '$s'")
    }
  }

  test("empty string hashes to 0; values stay within [0, P)") {
    assert(PolyHash.hash("") == 0L)
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(30)) // arbitrary UTF-16
      val h = PolyHash.hash(s)
      assert(h >= 0 && h < PolyHash.P)
    }
  }

  test("supplementary-plane characters hash as single code points") {
    val s = new String(Character.toChars(0x1F600)) // one code point, 2 chars
    assert(PolyHash.hash(s) == 0x1F600L)
    assert(PolyHash.hash(s) == naive(s))
  }

  test("the Catalyst expression computes the same values as the Scala fn") {
    import spark.implicits._
    val data = Seq("", "a", "hello world", "batch window spark", "é€")
    val got = data.toDF("s").select(PolyHash(col("s"))).as[Long].collect()
    assert(got.toSeq == data.map(PolyHash.hash))
  }

  test("expression survives codegen inside a higher-order function") {
    import spark.implicits._
    val got = Seq(Seq("a", "bc")).toDF("xs")
      .select(transform(col("xs"), x => PolyHash(x)).as("hs"))
      .as[Seq[Long]].head()
    assert(got == Seq(PolyHash.hash("a"), PolyHash.hash("bc")))
  }
}
