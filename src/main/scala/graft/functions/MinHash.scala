package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The MinHash permutation family and band fold — ONE definition shared
  * by the aggregate pipeline ([[graft.operators.Dedup]], which computes
  * per-permutation `min` columns over exploded shingle rows for the
  * one-shuffle corpus pass) and the scalar SQL surface below (which
  * computes a whole signature per row, for SQL-driven LSH and for
  * signing a single probe document at query time).
  *
  * Permutation j over a shingle hash h: `(a_j * h + b_j) mod P` with the
  * classic LCG constants; an EMPTY shingle set signs as P (2^31 − 1) in
  * every coordinate — the degenerate-document convention the q22 oracle
  * encodes as `COALESCE(list_min(...), P)`.
  */
object MinHash {

  val P: Long = PolyHash.P // 2^31 - 1

  def permA(j: Int): Long = (1103515245L * (j + 1)) % P
  def permB(j: Int): Long = (12345L * (j + 1) + 7) % P

  /** Whole signature from a document's (distinct) shingle hashes. A NULL
    * element propagates to a NULL signature (same convention as
    * `qdotBoxed` — silently reading a null slot as 0 would bias the
    * signature).
    */
  def signature(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i)) return null
      i += 1
    }
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val a = permA(j)
      val b = permB(j)
      var best = P
      i = 0
      while (i < n) {
        val v = (a * hashes.getLong(i) + b) % P
        if (v < best) best = v
        i += 1
      }
      sig(j) = best
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Per-band polynomial fold `(acc * 31 + m) mod P` over an LSH
    * signature split into `numBands` equal bands; returns one hash per
    * band. The signature length must divide evenly. A NULL element
    * propagates to a NULL result (see [[signature]]).
    */
  def bandHashes(sig: ArrayData, numBands: Int): ArrayData = {
    val n = sig.numElements()
    require(n % numBands == 0,
      s"signature length $n is not divisible into $numBands bands")
    var i = 0
    while (i < n) {
      if (sig.isNullAt(i)) return null
      i += 1
    }
    val rows = n / numBands
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var acc = 0L
      var r = 0
      while (r < rows) {
        acc = (acc * 31L + sig.getLong(b * rows + r)) % P
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] abstract class LongArrayToLongArrayExpression
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // a NULL array ELEMENT propagates to a NULL result (the eval helpers
  // return null), so the expression is nullable whenever the child or
  // its elements are
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }
  override def nullable: Boolean = child.nullable || elementsNullable

  /** Java call that maps the child array to the result array. */
  protected def evalCall(c: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (nullable)
      // the helper returns null on a null element; surface it as isNull
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = ${evalCall(c)};
        ${ev.isNull} = ${ev.value} == null;
      """)
    else
      // non-nullable child with non-nullable elements: the helper cannot
      // return null, and ev.isNull is the literal `false` (unassignable)
      defineCodeGen(ctx, ev, evalCall)
}

/** `MinHash.signature` as a codegen'd Catalyst expression:
  * `graft_minhash_sig(shingle_hashes, numHashes)`.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends LongArrayToLongArrayExpression {
  require(numHashes >= 1, "signature length must be >= 1")
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def evalCall(c: String): String =
    s"graft.functions.MinHash.signature($c, $numHashes)"

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(c: Column, numHashes: Int): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(c), numHashes))
}

/** `MinHash.bandHashes` as a codegen'd Catalyst expression:
  * `graft_band_hash(sig, numBands)`.
  */
case class BandHashes(child: Expression, numBands: Int)
    extends LongArrayToLongArrayExpression {
  require(numBands >= 1, "band count must be >= 1")
  override def prettyName: String = "graft_band_hash"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.bandHashes(input.asInstanceOf[ArrayData], numBands)

  override protected def evalCall(c: String): String =
    s"graft.functions.MinHash.bandHashes($c, $numBands)"

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

object BandHashes {
  def apply(c: Column, numBands: Int): Column =
    GraftShims.column(BandHashes(GraftShims.expression(c), numBands))
}
