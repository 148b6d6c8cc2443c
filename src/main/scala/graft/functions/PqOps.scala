package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd product-quantization kernels (Jégou et al. 2011,
  * "Product quantization for nearest neighbor search"): the vector is
  * split into M contiguous subspaces, each encoded as the id of its
  * nearest sub-centroid by INTEGER squared-L2 over the fixed-point
  * domain — exact 64-bit arithmetic end to end, so codes and ADC scores
  * are bit-identical across partitionings and vs the DuckDB oracle.
  *
  * Per-row work is the hot path (encode at index build, ADC at probe),
  * so both are tight codegen'd loops like [[NearestCentroid]], with the
  * codebook / distance table travelling inside the expression (the
  * broadcast-a-literal pattern — M·K·ds and M·K longs, trivially small).
  */
object PqOps {

  /** PQ codes for one quantized vector: for each subspace m, the id of
    * the sub-centroid minimizing Σ_d (qe[m·ds+d] − c[d])², smallest id
    * winning ties. Null element → NULL codes (the null-propagation
    * convention); a length mismatch with the codebook throws — a
    * mis-dimensioned vector must not silently encode garbage.
    */
  def encode(qe: ArrayData, cb: Array[Array[Array[Long]]]): ArrayData = {
    val m = cb.length
    val ds = cb(0)(0).length
    if (qe.numElements() != m * ds)
      throw new ArithmeticException(
        s"PQ encode of a ${qe.numElements()}-dim vector with an ${m}x$ds codebook")
    var i = 0
    while (i < m * ds) {
      if (qe.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      val sub = cb(mi)
      var best = Long.MaxValue
      var bestC = -1
      var c = 0
      while (c < sub.length) {
        val cent = sub(c)
        var s = 0L
        var d = 0
        while (d < ds) {
          val diff = qe.getLong(mi * ds + d) - cent(d)
          s += diff * diff
          d += 1
        }
        if (s < best) { best = s; bestC = c }
        c += 1
      }
      out(mi) = bestC.toLong
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance score: Σ_m table[m][codes[m]] — the PQ
    * approximation of the query-to-vector squared L2, via M lookups into
    * the per-subspace query-to-centroid distance table. Null element →
    * NULL; a code outside the table throws (corrupt index, fail fast).
    */
  def adc(codes: ArrayData, table: Array[Array[Long]]): java.lang.Long = {
    if (codes.numElements() != table.length)
      throw new ArithmeticException(
        s"ADC of ${codes.numElements()} codes against an ${table.length}-subspace table")
    var s = 0L
    var m = 0
    while (m < table.length) {
      if (codes.isNullAt(m)) return null
      val c = codes.getLong(m).toInt
      if (c < 0 || c >= table(m).length)
        throw new ArithmeticException(s"PQ code $c outside codebook of ${table(m).length}")
      s += table(m)(c)
      m += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** ARRAY<BIGINT> quantized vector → ARRAY<BIGINT> of M PQ codes. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Long]]])
    extends UnaryExpression {

  @transient private lazy val cb: Array[Array[Array[Long]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null array element → NULL codes
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqOps.encode(input.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "long[][][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
      |  graft.functions.PqOps.encode($c, $cbRef);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r;
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(codes: Column, codebooks: Seq[Seq[Seq[Long]]]): Column =
    GraftShims.column(PqEncode(GraftShims.expression(codes), codebooks))
}

/** ARRAY<BIGINT> of M PQ codes → BIGINT asymmetric-distance score. */
case class PqAdc(child: Expression, table: Seq[Seq[Long]])
    extends UnaryExpression {

  @transient private lazy val tab: Array[Array[Long]] =
    table.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null code → NULL score
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(input: Any): Any =
    PqOps.adc(input.asInstanceOf[ArrayData], tab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tabRef = ctx.addReferenceObj("pqtab", tab, "long[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Long ${ev.value}_r = graft.functions.PqOps.adc($c, $tabRef);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r.longValue();
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

object PqAdc {
  def apply(codes: Column, table: Seq[Seq[Long]]): Column =
    GraftShims.column(PqAdc(GraftShims.expression(codes), table))
}

/** Scalar-quantization kernel (the flat-index tier of the compression
  * spectrum: one code PER DIMENSION on a per-dimension linear grid,
  * where PQ spends one code per SUBSPACE). All arithmetic is exact
  * integer: `code_d = clamp(floor((v_d − min_d)·255 / span_d), 0, 255)`
  * with corpus-trained bounds riding in the expression as literals.
  */
object SqOps {

  /** Driver-side twin of [[SqEncode]] (for encoding the query vector):
    * `Math.floorDiv` ≡ DuckDB `//`; the clamp makes truncation-vs-floor
    * moot for out-of-range values (both round into the same clamp).
    */
  def encodeLocal(v: Seq[Long], mins: Array[Long], spans: Array[Long]): Seq[Long] =
    v.indices.map { d =>
      if (spans(d) == 0L) 0L
      else Math.min(255L, Math.max(0L,
        Math.floorDiv((v(d) - mins(d)) * 255L, spans(d))))
    }

  def encode(qe: ArrayData, mins: Array[Long], spans: Array[Long]): ArrayData = {
    if (qe.numElements() != mins.length)
      throw new ArithmeticException(
        s"SQ encode of a ${qe.numElements()}-dim vector with ${mins.length}-dim bounds")
    val n = mins.length
    val out = new Array[Long](n)
    var d = 0
    while (d < n) {
      if (qe.isNullAt(d)) return null
      val span = spans(d)
      out(d) =
        if (span == 0L) 0L
        else {
          val c = Math.floorDiv((qe.getLong(d) - mins(d)) * 255L, span)
          if (c < 0L) 0L else if (c > 255L) 255L else c
        }
      d += 1
    }
    new GenericArrayData(out)
  }
}

/** ARRAY<BIGINT> quantized vector → ARRAY<BIGINT> of per-dim SQ8 codes. */
case class SqEncode(child: Expression, mins: Seq[Long], spans: Seq[Long])
    extends UnaryExpression {

  @transient private lazy val mn: Array[Long] = mins.toArray
  @transient private lazy val sp: Array[Long] = spans.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null array element → NULL codes
  override def prettyName: String = "graft_sq_encode"

  override protected def nullSafeEval(input: Any): Any =
    SqOps.encode(input.asInstanceOf[ArrayData], mn, sp)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sqmn", mn, "long[]")
    val spRef = ctx.addReferenceObj("sqsp", sp, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
      |  graft.functions.SqOps.encode($c, $mnRef, $spRef);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r;
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SqEncode =
    copy(child = newChild)
}

object SqEncode {
  def apply(qe: Column, mins: Seq[Long], spans: Seq[Long]): Column =
    GraftShims.column(SqEncode(GraftShims.expression(qe), mins, spans))
}
