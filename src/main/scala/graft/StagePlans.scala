package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** PlanAudit's stage-level sibling: queries that Scratch-flush an
  * intermediate (q203's token stream, the winnow selection pass) execute
  * that subtree during build, so `PlanAudit` only shows the post-flush
  * half. This main prints the formatted plans of the SHARED STAGE frames
  * themselves, so flush-stage optimizations are reviewable the same way
  * (r18: the plans/r18 before/after evidence for the kernel rewrites).
  */
object StagePlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val q101Base = docs.select(
      org.apache.spark.sql.functions.col("doc_id"),
      graft.functions.WordShingleHashes(
        org.apache.spark.sql.functions.col("text"), 3).as("G"))
    val stages: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "stage_tokenize" -> operators.Corpus.tokenize(
        docs, operators.Corpus.ensureBpeMerges(spark, sfDir)),
      "stage_winnow_fps" -> operators.Dedup.winnowFingerprints(docs),
      "stage_winnow_spans" -> operators.Dedup.winnowFingerprintSpans(docs),
      "stage_q101_prefix" -> operators.Dedup.prefixSelection(q101Base))
    val wanted = if (args.isEmpty) stages.map(_._1).toSet else args.toSet
    stages.filter(s => wanted.contains(s._1)).foreach { case (n, df) =>
      println(s"\n========== $n ==========")
      println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
