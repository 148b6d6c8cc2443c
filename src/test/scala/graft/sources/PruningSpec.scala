package graft.sources

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-level data skipping on partitioned layouts — at 100 TB the
  * difference between scanning a directory and scanning everything:
  *
  *  - static pruning: a literal filter on the partition column must
  *    reach the scan as a PartitionFilter (directories never listed);
  *  - dynamic partition pruning: a selective dim-side filter must prune
  *    the fact side's partitions AT RUNTIME through the join
  *    (dynamicpruning subquery on the scan).
  *
  * Both are optimizer behaviors we rely on rather than reimplement —
  * these tests pin that our layouts/joins actually trigger them.
  */
class PruningSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private lazy val partedDocs: String = {
    val out = java.nio.file.Files.createTempDirectory("graft-parted-").toString
    Tables.load(spark, dir, "documents")
      .write.partitionBy("lang").mode("overwrite").parquet(out)
    out
  }

  test("a partition-column filter prunes directories at plan time") {
    val q = spark.read.parquet(partedDocs)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val pf = scan.partitionFilters.map(_.sql).mkString(", ")
    assert(pf.contains("lang"), s"partition filter must reach the scan, got: $pf")
    // the pruned scan must select strictly fewer partitions than exist
    val langs = spark.read.parquet(partedDocs)
      .select("lang").distinct().count()
    assert(langs > 1, "testdata has multiple languages")
    val selected = scan.selectedPartitions.partitionCount
    assert(selected < langs,
      s"expected < $langs partitions selected, got $selected")
  }

  test("a selective dim filter prunes fact partitions dynamically (DPP)") {
    import spark.implicits._
    // at sf0.001 the fact side is tiny, so DPP's size-based benefit
    // heuristic (sound at production scale) would skip the injection;
    // disable the stats estimate to observe the mechanics
    val pinned = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10")
    val old = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the dim must be a real source with a surviving Filter node: a
      // literal local relation is constant-folded before the pruning
      // rule runs and then carries no "selective predicate"
      val dimPath = java.nio.file.Files.createTempDirectory("graft-dim-").toString
      Seq(("en", 1), ("zh", 2)).toDF("lang", "grp")
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath)
        .filter(col("grp") === 1) // selective: only 'en' survives
      val q = spark.read.parquet(partedDocs)
        .join(dim, "lang")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamic partition pruning subquery on the fact scan:\n$plan")
      val rows = q.collect()
      assert(rows.length == 1 && rows.head.getString(0) == "en")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
