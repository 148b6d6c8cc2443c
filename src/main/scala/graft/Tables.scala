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

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark only reads via the
    // nanosAsLong legacy mode; the values are µs-precision, so converting
    // the nano count to TIMESTAMP_MICROS is lossless and matches DuckDB.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(sfDir, table))
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == org.apache.spark.sql.types.LongType && f.name == "ts")
        // `div` (integral division), NOT `/`: epoch-nanos exceed the 53-bit
        // double mantissa, so float division would corrupt microseconds
        d.withColumn(f.name,
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(s"${f.name} div 1000")))
      else d
    }
  }
}
