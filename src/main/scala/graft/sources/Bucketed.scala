package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout: pre-shuffle a fact table ONCE at write time so
  * every later equi-join / aggregation on the bucket key is
  * exchange-free. At 100 TB this converts the recurring dominant cost of
  * a join pipeline (re-shuffling the same fact table per query) into a
  * one-time write cost:
  *
  *  - both sides bucketed by the join key into the same bucket count →
  *    sort-merge join with NO Exchange on either side;
  *  - `sortBy` on the bucket key additionally removes the Sort;
  *  - groupBy on the bucket key aggregates without a shuffle.
  *
  * Spark only uses bucket info through the catalog, hence `saveAsTable`
  * (plain parquet paths don't carry bucket metadata).
  */
object Bucketed {

  /** Write `df` as a bucketed (and bucket-sorted) catalog table. */
  def write(df: DataFrame, table: String, buckets: Int, key: String,
      moreKeys: String*): Unit =
    df.write
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .mode("overwrite")
      .saveAsTable(table)
}
