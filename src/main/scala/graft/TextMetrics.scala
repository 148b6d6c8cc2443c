package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The quality-gate text metrics shared by the batch curation pipeline
  * ([[graft.operators.Curation]]), its streaming twin
  * ([[graft.streaming.CurationStream]]), the per-document stats query
  * (q28), and their DuckDB oracles — ONE definition so an edited pattern
  * can never silently fork the batch and streaming gates.
  *
  * Patterns evaluate identically under Java regex (Spark) and RE2
  * (DuckDB): word-boundary anchors + explicit classes, no backtracking
  * constructs. Ratios guard the zero-word case to NULL on both engines
  * (Spark double division would yield NaN, DuckDB version-dependently
  * NULL/inf — NULL is the one value both produce identically and that
  * comparison filters treat the same way: the row is dropped).
  */
object TextMetrics {

  /** One lowercase alphanumeric word. */
  val WordRe = "[a-z0-9]+"

  /** English stopword hits (word-boundary anchored). */
  val StopRe = "\\b(the|a|an|and|or|of|to|in|is)\\b"

  def wordCount(text: Column): Column = regexp_count(text, lit(WordRe))

  def stopCount(text: Column): Column = regexp_count(text, lit(StopRe))

  /** stops/words as DOUBLE, NULL when there are no words. */
  def stopRatio(words: Column, stops: Column): Column =
    when(words > 0, stops.cast("double") / words.cast("double"))

  // ---- DuckDB oracle fragments computing the exact same values ----------

  def wordCountSql(e: String): String = s"len(regexp_extract_all($e, '$WordRe'))"

  def stopCountSql(e: String): String = s"len(regexp_extract_all($e, '$StopRe'))"

  def stopRatioSql(e: String): String =
    s"(CASE WHEN ${wordCountSql(e)} > 0 THEN CAST(${stopCountSql(e)} AS DOUBLE)" +
      s" / CAST(${wordCountSql(e)} AS DOUBLE) END)"
}
