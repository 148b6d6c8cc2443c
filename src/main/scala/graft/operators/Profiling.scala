package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Data profiling: the validation pass every ingest pipeline runs before
  * trusting a new drop of data. ONE scan computes per-column null
  * counts, ranges, and cardinalities — at 100 TB this matters because
  * the alternative (one query per column) rescans the table per metric;
  * here every metric is a partial-aggregable expression in a single
  * whole-stage-codegen'd pass with map-side combine.
  */
object Profiling {

  /** Q44 — one-pass profile of the orders table. */
  val qProfile: QuerySpec = QuerySpec(
    "q44_profile",
    (s, dir) =>
      Tables.load(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("null_price"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("null_status"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        min(col("o_orderdate")).cast("timestamp_ntz").as("min_date"),
        max(col("o_orderdate")).cast("timestamp_ntz").as("max_date")),
    Some("""SELECT COUNT(*) AS n_rows,
           | CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
           | CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price,
           | CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_status,
           | MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           | MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           | COUNT(DISTINCT o_orderstatus) AS n_status,
           | COUNT(DISTINCT o_orderpriority) AS n_prio,
           | MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
           | FROM orders""".stripMargin.replaceAll("\n", "")))

  val specs: Seq[QuerySpec] = Seq(qProfile)
}
