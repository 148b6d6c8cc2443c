package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Re-proves q169's completeness theorem empirically: the deletion-
  * neighborhood equi-join finds EVERY pair within Levenshtein distance
  * 1 (the FastSS d=1 guarantee), so the gated plan equals brute force —
  * including on strings the synthetic customer names never exercise
  * (length changes from insertions/deletions, repeated characters).
  */
class FuzzyJoinSpec extends AnyFunSuite with SparkTestSession {
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  test("q169 equals the brute-force distance-1 join at sf0.001") {
    val fast = Entity.qFuzzyJoin.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val c = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val brute = c.as("a").join(c.as("b"), col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.name"), col("b.name")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(brute.nonEmpty, "gate corpus must exercise the operator")
    assert(fast == brute, "deletion-neighborhood join diverged from brute")
  }

  test("insert/delete edits (length-changing) are found via variants") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-fuzzy-").toString
    // pairs: (1,2) substitution, (1,3) deletion, (1,4) insertion,
    // (5,6) distance 2 sharing a variant (xa/ax -> a): must NOT match.
    Seq((1L, "abcde"), (2L, "abXde"), (3L, "abde"), (4L, "abcdef"),
        (5L, "xa"), (6L, "ax"))
      .toDF("c_custkey", "c_name")
      .withColumn("c_nationkey", lit(0))
      .withColumn("c_acctbal", lit(0.0d))
      .withColumn("c_mktsegment", lit("NONE"))
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val got = Entity.qFuzzyJoin.build(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)),
      s"unexpected match set: $got")
  }
}
