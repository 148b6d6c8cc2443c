package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed as a driver-checkable query.
  *
  * @param name   stable query id (key in `SparkEntry.queries`)
  * @param build  Spark implementation; `sfDir` is a testdata directory
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables (None → driver does a weaker rows-only check)
  * @param headline whether Bench times it in the per-round benchmark
  */
final case class QuerySpec(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = true)
