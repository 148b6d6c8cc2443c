package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The automatic half of the skew story ([[Skew]] is the manual half):
  * AQE detects a skewed sort-merge-join partition at runtime and splits
  * it into parallel sub-joins. Thresholds are lowered so toy data
  * triggers the same machinery that fires on real hot keys at scale.
  */
class AqeSkewJoinSpec extends AnyFunSuite with SparkTestSession {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition (skew=true in the executed plan)") {
    import spark.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 100k rows on one hot key vs a spread of cold keys
      val left = spark.range(100000).select(
        when(col("id") % 10 === 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val right = spark.range(2000).select(col("id").as("k"), lit("x").as("tag"))
      val joined = left.join(right, "k")
      // collect() executes THIS dataset's QueryExecution, so its
      // AdaptiveSparkPlan finalizes (count()/writes build separate ones)
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$plan")
    }
  }
}
