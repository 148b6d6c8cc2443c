package graft.operators

import graft.SparkTestSession
import graft.functions.Exact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkTestSession {

  import Skew._

  /** 10k rows, 95% on one hot key — the shape salting exists for. */
  private def skewed() = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 10000).map { i =>
      val k = if (rnd.nextInt(20) == 0) s"cold-${rnd.nextInt(50)}" else "hot"
      (k, i.toLong, rnd.nextDouble() * 100)
    }.toDF("k", "id", "v")
  }

  test("saltedAgg is bitwise identical to the direct aggregation") {
    import spark.implicits._
    val df = skewed()
    val direct = df.groupBy("k")
      .agg(Exact.dsum(col("v")).as("s"), count(lit(1)).as("c"))
    val salted = saltedAgg(df, Seq("k"), buckets = 16, saltSrc = Seq(col("id")),
      partials = Seq(Exact.dsumPartial(col("v")).as("p_s"), count(lit(1)).as("p_c")),
      merges = Seq(Exact.dsumMerge(col("p_s")).as("s"), sum(col("p_c")).as("c")))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("saltedJoin is row-identical to the plain join") {
    import spark.implicits._
    val left = skewed()
    val right = Seq(("hot", "H"), ("cold-1", "C1"), ("cold-2", "C2"))
      .toDF("k", "label")
    val plain = left.join(right, Seq("k")).select("k", "id", "label")
    val salted = saltedJoin(left, right, "k", buckets = 8,
      probeSaltSrc = Seq(col("id"))).select("k", "id", "label")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoinHotKeys is row-identical to the plain join for any hot set") {
    import spark.implicits._
    val left = skewed()
    val right = Seq(("hot", "H"), ("cold-1", "C1"), ("cold-2", "C2"))
      .toDF("k", "label")
    val plain = left.join(right, Seq("k")).select("k", "id", "label")
    // hot set deliberately includes a key with no matches and misses the
    // actual hot key half the time — correctness must not depend on it
    Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      k => k === "hot",
      k => k.isin("cold-1", "no-such-key"),
      k => lit(false),
      k => lit(true)
    ).foreach { hotSet =>
      val salted = Skew.saltedJoinHotKeys(left, right, "k", hotSet,
        buckets = 4, probeSaltSrc = Seq(col("id"))).select("k", "id", "label")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    }
  }

  test("salt actually spreads a hot key over the requested buckets") {
    import spark.implicits._
    val buckets = skewed().filter(col("k") === "hot")
      .select(salt(16, col("id"))).distinct().count()
    assert(buckets == 16, s"hot key spread over $buckets/16 buckets")
  }
}
