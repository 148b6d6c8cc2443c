package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd fixed-point vector math for the similarity hot path.
  *
  * The composed-builtin forms (`transform` for quantization, `aggregate(
  * zip_with(...))` for the dot product) evaluate interpreted — higher-
  * order functions are CodegenFallback — and allocate two intermediate
  * arrays per dot product. At 100 TB the cosine kernel runs per row (and
  * per centroid for IVF assignment), so it must be a tight codegen'd
  * loop. Semantics are bit-identical to the composed forms:
  *
  *  - [[Quantize]]: `round(x * 1e6)` with Spark's HALF_UP double
  *    rounding, cast to BIGINT;
  *  - [[QDot]]: integer dot product; NULL when lengths differ or the
  *    arrays are empty (the degenerate-input guard `Exact.qdot`
  *    documents, applied identically in the DuckDB oracle fragments).
  */
object VectorOps {

  private val Scale = 1000000.0d

  /** round(v*1e6) exactly as Spark's `round(double)`: BigDecimal HALF_UP
    * on the canonical decimal representation, then cast to long.
    */
  def quantizeValue(v: Double): Long =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
      throw new ArithmeticException(s"cannot quantize non-finite value $v")
    else
      java.math.BigDecimal.valueOf(v * Scale)
        .setScale(0, RoundingMode.HALF_UP).doubleValue().toLong

  private def hasNullElement(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  // Null elements propagate to null outputs, exactly like the composed
  // `transform(round(...))` form this expression is the drop-in for. The
  // no-null case (every real embedding) stays on a primitive-array path.
  def quantizeFloatArray(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (hasNullElement(a)) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (a.isNullAt(i)) null
          else java.lang.Long.valueOf(quantizeValue(a.getFloat(i).toDouble))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = quantizeValue(a.getFloat(i).toDouble); i += 1 }
      new GenericArrayData(out)
    }
  }

  def quantizeDoubleArray(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (hasNullElement(a)) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (a.isNullAt(i)) null
          else java.lang.Long.valueOf(quantizeValue(a.getDouble(i)))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = quantizeValue(a.getDouble(i)); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** Integer dot product; null (boxed) when sizes differ, are zero, or
    * either array carries a null element — a null slot must propagate to
    * a NULL product exactly like the composed `aggregate(zip_with(...))`
    * form (where `acc + x*y` over a null element nulls the whole fold),
    * not silently read as 0.
    */
  def qdotBoxed(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Index of the nearest centroid by (cosine desc, index asc). The
    * cosine arithmetic is EXACTLY the composed form's: integer dot cast
    * to double, divided by sqrt(self-dot) · precomputed centroid norm —
    * so assignments match a per-centroid cosine comparison bit for bit.
    * One pass: quantized input read once, K dots in a tight loop (the
    * composed `greatest(struct(cos_j, -j))` form re-evaluated its
    * `quantize` child per centroid occurrence once Catalyst pushed the
    * filter below the projection — 17× per row at K=8).
    */
  def nearestCentroid(qe: ArrayData, cents: Array[Array[Long]],
      norms: Array[Double]): java.lang.Integer = {
    val n = qe.numElements()
    if (hasNullElement(qe)) return null // null slot → NULL assignment, not 0
    var selfDot = 0L
    var i = 0
    while (i < n) { val v = qe.getLong(i); selfDot += v * v; i += 1 }
    // a zero vector has no cosine direction: every cosine is NaN, never
    // beats -Infinity, and the row would get cid -1 and silently drop
    // from the gated queries while the oracle keeps it — fail fast
    // instead (matching quantizeValue's non-finite guard)
    if (selfDot == 0L)
      throw new ArithmeticException(
        "nearest centroid of a zero vector is undefined (cosine is NaN)")
    val selfNorm = math.sqrt(selfDot.toDouble)
    var best = Double.NegativeInfinity
    var bestIdx = -1
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var dot = 0L
      i = 0
      while (i < n) { dot += qe.getLong(i) * c(i); i += 1 }
      val cos = dot.toDouble / (selfNorm * norms(j))
      if (cos > best) { best = cos; bestIdx = j }
      j += 1
    }
    java.lang.Integer.valueOf(bestIdx)
  }

  /** The first `nprobe` centroid indices ranked by (cosine desc, index
    * asc) — the multi-query generalization of [[nearestCentroid]]
    * (nprobe = 1 prefix ≡ its argmax) and the engine-side twin of the
    * oracle's `ROW_NUMBER() OVER (ORDER BY cosine DESC, cid)` probe
    * ranking. Same arithmetic: integer dots cast to double, one
    * multiply of the two sqrt norms, one divide — bit-equal on both
    * engines (IEEE multiplication commutes, so the driver's
    * sqrt(cc)·qn and this selfNorm·norms(j) agree exactly).
    */
  def probeCentroids(qe: ArrayData, cents: Array[Array[Long]],
      norms: Array[Double], nprobe: Int): ArrayData = {
    val n = qe.numElements()
    if (hasNullElement(qe)) return null // null slot → NULL probe set
    var selfDot = 0L
    var i = 0
    while (i < n) { val v = qe.getLong(i); selfDot += v * v; i += 1 }
    if (selfDot == 0L)
      throw new ArithmeticException(
        "probe ranking of a zero vector is undefined (cosine is NaN)")
    val selfNorm = math.sqrt(selfDot.toDouble)
    val cos = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var dot = 0L
      i = 0
      while (i < n) { dot += qe.getLong(i) * c(i); i += 1 }
      cos(j) = dot.toDouble / (selfNorm * norms(j))
      j += 1
    }
    val ranked = Array.range(0, cents.length).sortBy(j => (-cos(j), j))
    new GenericArrayData(ranked.take(math.min(nprobe, cents.length)))
  }
}

/** Fixed-point quantization of ARRAY<FLOAT> / ARRAY<DOUBLE> to
  * ARRAY<BIGINT> (x → round(x * 1e6)).
  */
case class Quantize(child: Expression) extends UnaryExpression {

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true // unresolved child; checkInputDataTypes rejects later
    })
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_quantize"

  override protected def nullSafeEval(input: Any): Any = elementType match {
    case FloatType => VectorOps.quantizeFloatArray(input.asInstanceOf[ArrayData])
    case DoubleType => VectorOps.quantizeDoubleArray(input.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = elementType match {
      case FloatType => "quantizeFloatArray"
      case DoubleType => "quantizeDoubleArray"
    }
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Quantize =
    copy(child = newChild)
}

object Quantize {
  def apply(c: Column): Column = GraftShims.column(Quantize(GraftShims.expression(c)))
}

/** Exact integer dot product of two ARRAY<BIGINT> vectors; NULL when the
  * lengths differ or either is empty.
  */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> inputs, got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_qdot"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    VectorOps.qdotBoxed(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Long ${ev.value}_r = graft.functions.VectorOps.qdotBoxed($a, $b);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r.longValue();
      |}
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDot =
    copy(left = newLeft, right = newRight)
}

object QDot {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(QDot(GraftShims.expression(a), GraftShims.expression(b)))
}

/** Nearest-centroid assignment over a small fixed codebook (IVF): the
  * index (= centroid id for a codebook sorted by id) of the centroid with
  * the highest cosine against the quantized input vector, smallest index
  * winning ties. The codebook travels inside the expression (the
  * broadcast-a-literal pattern — K·dim longs, trivially small).
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression {

  @transient private lazy val cents: Array[Array[Long]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    cents.map(c => math.sqrt(c.map(v => v * v).sum.toDouble))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null array element → NULL assignment
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.nearestCentroid(input.asInstanceOf[ArrayData], cents, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Integer ${ev.value}_r =
      |  graft.functions.VectorOps.nearestCentroid($c, $centsRef, $normsRef);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r.intValue();
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(qe: Column, centroids: Seq[Seq[Long]]): Column =
    GraftShims.column(NearestCentroid(GraftShims.expression(qe), centroids))
}

/** The query's first-`nprobe` IVF probe set as ARRAY<INT> of centroid
  * indices, ranked (cosine desc, index asc) — [[NearestCentroid]]'s
  * multi-probe form, for serving BATCHES of queries map-side (the
  * driver-side ranking q26b/q26c use is per-single-query).
  */
case class ProbeCentroids(child: Expression, centroids: Seq[Seq[Long]],
    nprobe: Int) extends UnaryExpression {

  @transient private lazy val cents: Array[Array[Long]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    cents.map(c => math.sqrt(c.map(v => v * v).sum.toDouble))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null array element → NULL probe set
  override def prettyName: String = "graft_probe_centroids"

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.probeCentroids(input.asInstanceOf[ArrayData], cents, norms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
      |  graft.functions.VectorOps.probeCentroids($c, $centsRef, $normsRef, $nprobe);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r;
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeCentroids =
    copy(child = newChild)
}

object ProbeCentroids {
  def apply(qe: Column, centroids: Seq[Seq[Long]], nprobe: Int): Column =
    GraftShims.column(
      ProbeCentroids(GraftShims.expression(qe), centroids, nprobe))
}
