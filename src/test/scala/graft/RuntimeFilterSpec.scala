package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning — the built-in scale lever for
  * selective joins: when one join side is filtered hard, Catalyst
  * injects a Bloom filter built from the small side into the big side's
  * scan, so most of the 100 TB probe side is dropped BEFORE the shuffle
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`). We rely on the
  * optimizer for this rather than hand-building semi-join prefilters —
  * this spec pins that the injection actually fires on our join shapes
  * and changes no results.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.01"

  test("selective join injects a bloom might_contain on the probe side") {
    val pinned = Seq(
      // thresholds sized for production data; at sf0.01 both sides are
      // tiny, so open them up to observe the injection mechanics
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // keep the join a shuffle join so the filter has a shuffle to save
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def query = {
        val li = Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
        val ord = Tables.load(spark, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("q"))
      }
      val plan = query.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the probe side, got:\n$plan")

      // the filter is a pure pruning optimization: identical results
      val withFilter = query.collect().map(_.toString).sorted
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val withoutFilter = query.collect().map(_.toString).sorted
      assert(withFilter.sameElements(withoutFilter))
      assert(withFilter.nonEmpty)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
