package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout evaluation: Z-order (Morton) clustering
  * vs single-dimension-major sorting, measured the way a lakehouse table
  * actually benefits — BLOCK PRUNING. A 100 TB table's scan cost is
  * governed by which files/row-groups the reader can skip from min/max
  * column statistics; Z-ordering interleaves the bits of two dimensions
  * so a 2-D range predicate intersects ~√ the blocks a one-dimension-
  * major sort makes it touch on the secondary dimension.
  *
  * Everything here is integer arithmetic on bit-interleaved keys —
  * identical in Spark and DuckDB (shifts/ands on BIGINT) — and the plan
  * is PURE MAP + one ≤512-group aggregation: block membership is a
  * value-range function of the row (`key >> 8`, the top key bits — how a
  * range-partitioned writer actually splits files), NOT a global
  * row_number, so there is no single-task sort anywhere. At 100 TB the
  * layout itself is `repartitionByRange(z).sortWithinPartitions(z)` at
  * write time and the per-block min/max stats come free from parquet
  * footers; this query computes exactly those stats and the read set a
  * predicate implies under each layout.
  */
object Layout {

  // the rectangle predicate: a user-shard band × one week (declared
  // before the spec — the q82 object-init-order rule)
  private val ULo = 8
  private val UHi = 71
  private val DLo = 64
  private val DHi = 127
  private val EpochUs20240101 = 1704067200000000L
  // the events corpus spans a fixed 30-day window at every SF; one time
  // cell is 1/256 of it, so the time dimension FILLS its 8 bits (a
  // 0..29 day index would leave the top 3 bits constant and Morton
  // cells would lose all time resolution at this granularity)
  private val TimeCellUs = 2592000000000L / 256

  /** Morton-interleave two 8-bit columns (`u` odd bit positions, `d`
    * even) — literal shift amounts only (the q85 shiftright rule).
    */
  private def morton(u: Column, d: Column): Column =
    (0 until 8).map { b =>
      (shiftleft(shiftright(u, b).bitwiseAND(lit(1L)), 2 * b + 1)) +
        (shiftleft(shiftright(d, b).bitwiseAND(lit(1L)), 2 * b))
    }.reduce(_ + _)

  private def mortonSql(u: String, d: String): String =
    (0 until 8).map { b =>
      s"((($u >> $b) & 1) << ${2 * b + 1}) + ((($d >> $b) & 1) << ${2 * b})"
    }.mkString(" + ")

  /** q95 — block-pruning report for the events table laid out two ways
    * over the (user-shard, day) plane: `zorder` (block = top 8 bits of
    * the Morton key) vs `timemajor` (block = day — the top 8 bits of the
    * concatenated timecell·256+user key, i.e. a time-sorted table). Same
    * 16-bit key space, same 256-block granularity; per block the
    * parquet-footer statistics (min/max of both dimensions, row count),
    * then the read set of the rectangle predicate: a block is READ iff
    * its [min,max] envelopes intersect the rectangle on BOTH
    * dimensions. Reported per layout: occupied blocks, blocks read,
    * rows read (the I/O the predicate costs), rows matched (the I/O it
    * needs). One scan serves both layouts: the row explodes onto a
    * 2-literal layout tag and the aggregation key is (tag, block).
    */
  val qZorderPruning: QuerySpec = QuerySpec(
    "q95_zorder_pruning",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(pmod(col("user_id"), lit(256L)).as("ux"),
          least(greatest(
            ((unix_micros(col("ts")) - lit(EpochUs20240101)) / lit(TimeCellUs))
              .cast("long"), lit(0L)), lit(255L)).as("dx"))
        .select(col("ux"), col("dx"),
          shiftright(morton(col("ux"), col("dx")), 8).as("zb"))
      val tagged = ev.select(col("ux"), col("dx"),
        explode(array(lit("zorder"), lit("timemajor"))).as("layout"),
        col("zb"))
        .select(col("layout"), col("ux"), col("dx"),
          when(col("layout") === "zorder", col("zb"))
            .otherwise(col("dx")).as("block"),
          (col("ux").between(ULo, UHi) && col("dx").between(DLo, DHi))
            .cast("long").as("hit"))
      tagged.groupBy(col("layout"), col("block"))
        .agg(count(lit(1)).as("n"), sum(col("hit")).as("hits"),
          min(col("ux")).as("mnu"), max(col("ux")).as("mxu"),
          min(col("dx")).as("mnd"), max(col("dx")).as("mxd"))
        .withColumn("read",
          (col("mnu") <= UHi && col("mxu") >= ULo &&
            col("mnd") <= DHi && col("mxd") >= DLo).cast("long"))
        .groupBy(col("layout"))
        .agg(count(lit(1)).as("blocks_total"),
          sum(col("read")).as("blocks_read"),
          sum(col("read") * col("n")).as("rows_read"),
          sum(col("hits")).as("rows_matched"))
    },
    Some(s"""WITH ev AS (SELECT
            |   ((user_id % 256) + 256) % 256 AS ux,
            |   least(greatest((epoch_us(ts) - $EpochUs20240101)
            |     // $TimeCellUs, 0), 255) AS dx
            |  FROM events),
            | k AS (SELECT ux, dx,
            |   (${mortonSql("ux", "dx")}) >> 8 AS zb FROM ev),
            | t AS (SELECT layout, ux, dx,
            |   CASE WHEN layout = 'zorder' THEN zb ELSE dx END AS block,
            |   CASE WHEN ux BETWEEN $ULo AND $UHi
            |    AND dx BETWEEN $DLo AND $DHi THEN 1 ELSE 0 END AS hit
            |  FROM k, unnest(['zorder', 'timemajor']) u(layout)),
            | b AS (SELECT layout, block, COUNT(*) AS n,
            |   CAST(SUM(hit) AS BIGINT) AS hits,
            |   MIN(ux) AS mnu, MAX(ux) AS mxu,
            |   MIN(dx) AS mnd, MAX(dx) AS mxd
            |  FROM t GROUP BY layout, block),
            | r AS (SELECT layout, n, hits,
            |   CASE WHEN mnu <= $UHi AND mxu >= $ULo
            |    AND mnd <= $DHi AND mxd >= $DLo THEN 1 ELSE 0 END AS read
            |  FROM b)
            | SELECT layout, COUNT(*) AS blocks_total,
            |  CAST(SUM(read) AS BIGINT) AS blocks_read,
            |  CAST(SUM(read * n) AS BIGINT) AS rows_read,
            |  CAST(SUM(hits) AS BIGINT) AS rows_matched
            | FROM r GROUP BY layout""".stripMargin.replaceAll("\n", "")))

  private val Splits = 32
  private val CoarseBlocks = 4096

  /** q99 — range-partition split planner: the EXACT version of the
    * sampling step behind `repartitionByRange` / a range-partitioned
    * writer. 31 interior cut points of the events time key at 0-based
    * ranks `((n−1)·i) div 32`, then the per-bucket row counts those cuts
    * imply — the balance audit that decides whether a layout's split
    * keys need recomputing before a 100 TB write (q73's audit, for the
    * RANGE layout q95 evaluates).
    *
    * No global sort anywhere: the rank extraction is the q56 two-level
    * cumsum — the value histogram (one hash aggregation) cumsums inside
    * 4096 value-range coarse blocks in parallel windows, block offsets
    * come from a window over the ≤4096-row block summary (the only
    * serial pass, bounded by the block count), and identical histogram
    * exchanges collapse via reuse. Cuts are collected as 31 literals
    * (the q60b codebook rule — a joined subplan would re-execute per
    * branch), so bucket assignment is a codegen'd 31-term comparison sum
    * over the raw scan: pure map + one 32-group aggregation. At 100 TB a
    * writer swaps the exact ranks for RangePartitioner's reservoir
    * sample; the audit side (assign + count vs the cuts) is unchanged —
    * exactness here is what lets DuckDB gate it.
    */
  val qRangeSplits: QuerySpec = QuerySpec(
    "q99_range_splits",
    (s, dir) => {
      val v = Tables.load(s, dir, "events")
        .select(unix_micros(col("ts")).as("v")).filter(col("v").isNotNull)
      val bounds = v.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n")).head()
      val (mn, mx, n) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
      val width = (mx - mn) / CoarseBlocks + 1 // nonneg: / == floor
      val hist = v.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("blk",
          (((col("v") - mn) - pmod(col("v") - mn, lit(width))) / width)
            .cast("long"))
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("blk")).orderBy(col("v"))
      val wBlk = org.apache.spark.sql.expressions.Window.orderBy(col("blk"))
        .rowsBetween(Long.MinValue, -1)
      val off = hist.groupBy(col("blk")).agg(sum(col("cnt")).as("bc"))
        .withColumn("boff", coalesce(sum(col("bc")).over(wBlk), lit(0L)))
        .select(col("blk"), col("boff"))
      val cum = hist.withColumn("wcum", sum(col("cnt")).over(wIn))
        .join(broadcast(off), Seq("blk"))
        .select(col("v"), (col("wcum") + col("boff")).as("cum"))
      val ranks = (1 until Splits).map(i => (n - 1) * i / Splits)
      val cutCols = ranks.zipWithIndex.map { case (r, i) =>
        min(when(col("cum") > r, col("v"))).as(s"c$i")
      }
      val cutRow = cum.agg(cutCols.head, cutCols.tail: _*).head()
      val cuts = (0 until Splits - 1).map(cutRow.getLong)
      val bucket = cuts.map(c => when(col("v") > c, 1L).otherwise(0L))
        .reduce(_ + _)
      v.select(bucket.as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    },
    Some(s"""WITH vv AS (SELECT epoch_us(ts) AS v FROM events
            |  WHERE ts IS NOT NULL),
            | h AS (SELECT v, COUNT(*) AS c FROM vv GROUP BY v),
            | cm AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
            |   SUM(c) OVER () AS n FROM h),
            | cuts AS (SELECT i, MIN(CASE WHEN cum > ((n - 1) * i) // $Splits
            |   THEN v END) AS cut FROM cm, range(1, $Splits) t(i) GROUP BY i),
            | asg AS (SELECT h.v, h.c,
            |   CAST(SUM(CASE WHEN h.v > cuts.cut THEN 1 ELSE 0 END) AS BIGINT)
            |     AS bucket
            |  FROM h CROSS JOIN cuts GROUP BY h.v, h.c)
            | SELECT bucket, CAST(SUM(c) AS BIGINT) AS n_rows
            | FROM asg GROUP BY bucket""".stripMargin.replaceAll("\n", "")))

  val specs: Seq[QuerySpec] = Seq(qZorderPruning, qRangeSplits)
}
