package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic polynomial rolling hash over a string's code points:
  *
  *   h = c0;  h = (h * 31 + c_i) mod (2^31 - 1)
  *
  * This is the engine-wide token/fingerprint hash used by MinHash,
  * SimHash, LSH banding and document fingerprinting. It is chosen so the
  * exact same value is computable in plain ANSI SQL (fold over
  * `ascii(substr(s,i,1))`), which is what lets the dedup operators be
  * oracle-checked exactly instead of "approximately". All intermediate
  * values fit in a signed 64-bit integer ((2^31-1)*31 + c < 2^36).
  *
  * Implemented as a native Catalyst expression with codegen (not a Scala
  * UDF) so it stays inside whole-stage codegen on the hot dedup path.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Mersenne prime 2^31 - 1: keeps every intermediate product of the
    * MinHash permutations `(a*h + b) mod P` inside 63 bits.
    */
  final val P = 2147483647L

  /** Matches the no-initial-value left fold DuckDB's `list_reduce` does:
    * first code point seeds the accumulator. Empty string hashes to 0.
    * Iterates CODE POINTS (not UTF-16 units) so supplementary-plane
    * characters hash identically to the oracle's code-point `ascii()`.
    */
  def hash(s: String): Long = {
    val n = s.length
    if (n == 0) return 0L
    var cp = s.codePointAt(0)
    var h = cp.toLong
    var i = Character.charCount(cp)
    while (i < n) {
      cp = s.codePointAt(i)
      h = (h * 31L + cp.toLong) % P
      i += Character.charCount(cp)
    }
    h
  }

  def apply(c: Column): Column = GraftShims.column(PolyHash(GraftShims.expression(c)))

  /** Make `graft_polyhash` usable inside SQL/`expr` lambda bodies. */
  def register(spark: SparkSession): Unit =
    GraftShims.registerFunction(spark, "graft_polyhash", es => PolyHash(es.head))

  /** DuckDB SQL computing the identical hash for expression `e`
    * (ASCII/BMP inputs; the testdata corpus is ASCII).
    */
  def oracleSql(e: String): String =
    s"""(CASE WHEN length($e) = 0 THEN 0 ELSE list_reduce(
       |  list_transform(range(1, length($e) + 1),
       |                 i -> CAST(ascii(substr($e, i, 1)) AS BIGINT)),
       |  (x, y) -> (x * 31 + y) % 2147483647) END)""".stripMargin.replaceAll("\n", " ")
}
