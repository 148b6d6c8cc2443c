package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Bounded edit distance for the fuzzy-join verify step (q169).
  *
  * `functions.levenshtein` computes the FULL O(n·m) Wagner-Fischer
  * matrix per call (~10 µs on 18-char names — the q169 verify was 10 s
  * of the query's 12 s), but a candidate verify only needs "is the
  * distance ≤ d, and what is it exactly if so". For d=1 that is an O(n)
  * common-prefix/common-suffix walk; for larger d a banded DP touching
  * (2d+1)·max cells with early exit. Same discipline as
  * [[TextHashes]]/[[VectorOps]]: the hot per-row kernel is a native
  * codegen'd expression, equivalence-spec'd against the built-in.
  */
object EditDistance {

  /** Exact Levenshtein distance between `a` and `b` when it is ≤ bound,
    * else −1. Code-point based, matching `functions.levenshtein` on all
    * inputs (both count Unicode code points, not UTF-16 units).
    */
  def editWithin(a: String, b: String, bound: Int): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val n = x.length
    val m = y.length
    if (math.abs(n - m) > bound) return -1
    if (bound == 1) {
      // dist ≤ 1  ⇔  commonPrefix + commonSuffix ≥ max(n, m) − 1
      // (the single edit splits the strings into a matching prefix and
      // a matching suffix around it; the cap at min(n, m) − prefix keeps
      // overlapping prefix/suffix from double-counting)
      val minLen = math.min(n, m)
      val maxLen = math.max(n, m)
      var i = 0
      while (i < minLen && x(i) == y(i)) i += 1
      var j = 0
      while (j < minLen - i && x(n - 1 - j) == y(m - 1 - j)) j += 1
      if (i + j >= maxLen) 0
      else if (i + j >= maxLen - 1) 1
      else -1
    } else {
      val inf = bound + 1
      var prev = new Array[Int](m + 1)
      var cur = new Array[Int](m + 1)
      var j0 = 0
      while (j0 <= m) { prev(j0) = if (j0 <= bound) j0 else inf; j0 += 1 }
      var i = 1
      while (i <= n) {
        java.util.Arrays.fill(cur, inf)
        cur(0) = if (i <= bound) i else inf
        var best = cur(0)
        var j = math.max(1, i - bound)
        val to = math.min(m, i + bound)
        while (j <= to) {
          val cost = if (x(i - 1) == y(j - 1)) 0 else 1
          var v = prev(j - 1) + cost
          if (prev(j) + 1 < v) v = prev(j) + 1
          if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1
          if (v > inf) v = inf
          cur(j) = v
          if (v < best) best = v
          j += 1
        }
        if (best > bound) return -1
        val t = prev; prev = cur; cur = t
        i += 1
      }
      if (prev(m) <= bound) prev(m) else -1
    }
  }
}

/** `editWithin` as a codegen'd Catalyst expression: INT distance when
  * ≤ bound, −1 otherwise; NULL on NULL input.
  */
case class EditWithin(left: Expression, right: Expression, bound: Int)
    extends BinaryExpression {
  require(bound >= 1, "bound must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two STRING inputs, got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_edit_within"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditDistance.editWithin(a.toString, b.toString, bound)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.EditDistance.editWithin($a.toString(), $b.toString(), $bound)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditWithin =
    copy(left = newLeft, right = newRight)
}

object EditWithin {
  def apply(a: Column, b: Column, bound: Int): Column =
    GraftShims.column(
      EditWithin(GraftShims.expression(a), GraftShims.expression(b), bound))
}
