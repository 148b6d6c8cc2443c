package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Determinism helpers for floating-point aggregation.
  *
  * A plain `SUM(double)` depends on partial-aggregation order, which is
  * nondeterministic under shuffles — different plans (or engines) give
  * answers differing in the last ulps. Every aggregate the engine
  * exposes therefore sums in exact DECIMAL and casts the final value
  * back to DOUBLE: the result is identical for any partitioning (and
  * bitwise equal to the DuckDB oracle computing the same way). At 100 TB
  * this is also the difference between a reproducible pipeline and one
  * whose outputs change per run.
  *
  * Vector math uses fixed-point quantization (1e6) so dot products are
  * exact 64-bit integer arithmetic — associative, order-insensitive,
  * and exactly reproducible in SQL.
  */
object Exact {
  private val Dec = DecimalType(18, 6)

  // Input-domain precondition: |value| < 1e12 and finite. Under Spark 4's
  // default ANSI mode, a row outside DECIMAL(18,6) (or NaN/Inf) fails the
  // query LOUDLY (NUMERIC_VALUE_OUT_OF_RANGE) rather than silently
  // degrading — the intended behavior for a reproducibility-first
  // aggregate. Callers with dirty data should pre-filter or widen Dec.

  /** Order-insensitive SUM over a double column. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Two-phase split of [[dsum]] for salted/skew-resistant aggregation:
    * decimal sums are associative, so SUM of per-(key, salt) partials is
    * BITWISE identical to the direct per-key sum at any bucketing.
    */
  def dsumPartial(c: Column): Column = sum(c.cast(Dec))
  def dsumMerge(partial: Column): Column = sum(partial).cast(DoubleType)

  /** Order-insensitive AVG over a double column. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType) / count(c)

  /** Order-insensitive windowed SUM over a double column. */
  def dsumOver(c: Column, w: WindowSpec): Column =
    sum(c.cast(Dec)).over(w).cast(DoubleType)

  /** DuckDB oracle fragments computing the exact same values. */
  def dsumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"
  def davgSql(e: String): String =
    s"(CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE) / COUNT($e))"

  // ---- fixed-point vector math over ARRAY<FLOAT> ----------------------

  private val Scale = 1000000.0d

  /** Quantize a float-array column to BIGINT fixed point (x * 1e6,
    * round-half-away-from-zero — same in Spark and DuckDB). Codegen'd
    * [[Quantize]] expression: one tight loop per row, no interpreted
    * higher-order lambdas on the similarity hot path.
    */
  def quantize(a: Column): Column = Quantize(a)

  /** Exact integer dot product of two quantized vectors. NULL when the
    * lengths differ or either is empty — zip_with would otherwise
    * null-pad silently; the SQL fragment applies the same guard so both
    * engines agree on degenerate inputs. Codegen'd [[QDot]] expression.
    */
  def qdot(qa: Column, qb: Column): Column = QDot(qa, qb)

  /** Cosine similarity from quantized vectors: the only floating-point
    * steps are one sqrt+divide over exact integers, so the double result
    * is identical everywhere.
    */
  def cosineFromQuantized(qa: Column, qb: Column): Column =
    qdot(qa, qb).cast(DoubleType) /
      (sqrt(qdot(qa, qa).cast(DoubleType)) * sqrt(qdot(qb, qb).cast(DoubleType)))

  def cosine(a: Column, b: Column): Column =
    cosineFromQuantized(quantize(a), quantize(b))

  /** DuckDB fragment: quantized vector for list expression `e`. */
  def quantizeSql(e: String): String =
    s"list_transform($e, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"

  /** DuckDB fragment: exact dot of two quantized list expressions (same
    * degenerate-input guard as [[qdot]]).
    */
  def qdotSql(qa: String, qb: String): String =
    s"(CASE WHEN len($qa) = len($qb) AND len($qa) > 0 THEN " +
      s"CAST(list_sum(list_transform(range(1, len($qa) + 1), i -> $qa[i] * $qb[i])) AS BIGINT) " +
      "ELSE NULL END)"

  def cosineSql(qa: String, qb: String): String =
    s"(CAST(${qdotSql(qa, qb)} AS DOUBLE) / " +
      s"(sqrt(CAST(${qdotSql(qa, qa)} AS DOUBLE)) * sqrt(CAST(${qdotSql(qb, qb)} AS DOUBLE))))"
}
