package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries so
  * scan pruning / pushdown / join strategy / codegen spans can be reviewed
  * (and regressions caught by eye) without running them.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // SPARK_GRAFT_PLAN_NOAQE=1: print the STATIC plan (AQE wraps the
      // tree in unexecuted stages, hiding ReusedExchange dedup — the
      // PlanShapeSpec/AnnPrunedSpec discipline, exposed for eyeballs)
      .config("spark.sql.adaptive.enabled",
        !sys.env.get("SPARK_GRAFT_PLAN_NOAQE").contains("1"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) Queries.all.map(_.name) else args.toSeq
    Queries.all.filter(q => wanted.contains(q.name)).foreach { q =>
      println(s"\n========== ${q.name} ==========")
      println(q.build(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
