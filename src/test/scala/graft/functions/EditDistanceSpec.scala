package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[EditWithin]] must be drop-in equivalent to the built-in
  * `levenshtein` it replaced in q169's verify: for every pair,
  * `editWithin(a, b, d) == if (levenshtein(a, b) <= d) levenshtein(a, b)
  * else -1` — on seeded random strings exercising both the d=1
  * prefix/suffix fast path and the banded DP, plus the adversarial
  * overlap cases (repeated characters, shared prefix AND suffix).
  */
class EditDistanceSpec extends AnyFunSuite with SparkTestSession {

  private def corpus(seed: Int, rows: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abc" // tiny alphabet => dense near-matches
    def word(n: Int): String =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    (1 to rows).map { _ =>
      val a = word(rnd.nextInt(8))
      // half the pairs: a perturbation of a (sub/ins/del); half: fresh
      val b =
        if (rnd.nextBoolean() && a.nonEmpty) {
          val p = rnd.nextInt(a.length)
          rnd.nextInt(3) match {
            case 0 => a.updated(p, alpha(rnd.nextInt(alpha.length)))
            case 1 => a.take(p) + alpha(rnd.nextInt(alpha.length)) + a.drop(p)
            case _ => a.take(p) + a.drop(p + 1)
          }
        } else word(rnd.nextInt(8))
      (a, b)
    } ++ Seq(("", ""), ("", "a"), ("xa", "ax"), ("aa", "aaa"),
      ("aba", "ab"), ("abab", "baba"), ("aXa", "aa"), ("aaaa", "aaa"))
  }

  for (bound <- Seq(1, 2, 3)) {
    test(s"editWithin(bound=$bound) matches levenshtein on 2000 seeded pairs") {
      import spark.implicits._
      val df = corpus(seed = 7 * bound, rows = 2000).toDF("a", "b")
        .select(col("a"), col("b"),
          EditWithin(col("a"), col("b"), bound).as("fast"),
          levenshtein(col("a"), col("b")).as("full"))
      val bad = df.filter(
        col("fast") =!= when(col("full") <= bound, col("full"))
          .otherwise(lit(-1))).collect()
      assert(bad.isEmpty, s"divergent pairs: ${bad.take(5).mkString(", ")}")
    }
  }

  test("graft_edit_within is SQL-registered") {
    Registry.register(spark)
    val r = spark.sql(
      "SELECT graft_edit_within('abcde', 'abXde', 1) AS d," +
        " graft_edit_within('xa', 'ax', 1) AS miss").head()
    assert(r.getInt(0) == 1 && r.getInt(1) == -1)
  }
}
