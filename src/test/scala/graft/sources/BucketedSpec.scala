package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of bucketing is the ABSENCE of Exchange operators: joining
  * two tables bucketed by the join key must not shuffle either side, and
  * aggregating on the bucket key must not shuffle at all.
  */
class BucketedSpec extends AnyFunSuite with SparkTestSession {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q45 builds exchange-free on the bucketed layout and returns join rows") {
    // the gated query asserts its own plan shape at build time (a
    // regression would throw here); the oracle checks the values
    val df = Bucketed.qBucketedJoin.build(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq ==
      Seq("o_orderkey", "o_orderpriority", "n_items", "sum_qty"))
    assert(df.count() > 0)
    // the pinned confs were restored after the build-time assert
    assert(spark.conf.get("spark.sql.adaptive.enabled") != "false" ||
      spark.conf.getOption("spark.sql.adaptive.enabled").isEmpty)
  }

  test("equi-join and groupBy on the bucket key run without Exchange") {
    import spark.implicits._
    // unique names: the in-memory catalog forgets tables across JVMs but
    // their warehouse directories survive
    val (left, right) = (s"bkt_left_${System.nanoTime()}", s"bkt_right_${System.nanoTime()}")
    // force the shuffle-based path so the assertion is about bucketing,
    // not about broadcast thresholds or AQE re-planning
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      try {
        Bucketed.write((1L to 1000L).map(i => (i % 100, i)).toDF("k", "v"),
          left, buckets = 8, key = "k")
        Bucketed.write((1L to 500L).map(i => (i % 100, s"n$i")).toDF("k", "name"),
          right, buckets = 8, key = "k")

        val joined = spark.table(left).join(spark.table(right), "k")
        val joinPlan = joined.queryExecution.executedPlan.toString
        assert(!joinPlan.contains("Exchange"),
          s"bucketed join must be exchange-free:\n$joinPlan")
        assert(joined.count() == 1000 * 5)

        val agg = spark.table(left).groupBy("k").agg(sum("v").as("s"))
        val aggPlan = agg.queryExecution.executedPlan.toString
        assert(!aggPlan.contains("Exchange"),
          s"bucket-key aggregation must be exchange-free:\n$aggPlan")
        assert(agg.count() == 100)
      } finally Seq(left, right).foreach { tbl =>
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
      }
    }
  }
}
