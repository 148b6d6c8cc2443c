package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * One parquet file per table under a scale-factor directory, e.g.
  * `/root/testdata/sf0.01/lineitem.parquet`. All queries go through
  * here so scans stay declarative (column pruning + predicate pushdown
  * reach the parquet reader via Catalyst).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, table: String): String = s"$sfDir/$table.parquet"

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(path(sfDir, table))
}
