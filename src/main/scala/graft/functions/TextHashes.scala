package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd n-gram hashing for the dedup hot path.
  *
  * The composed-builtin formulations (`transform(sequence(...), i ->
  * PolyHash(substr(text, i, 3)))` for char 3-grams; `split` + three
  * `slice`s + `zip_with` + `transform` for word shingles) are correct but
  * slow at scale for two reasons: higher-order functions are
  * CodegenFallback (they break whole-stage codegen and evaluate their
  * lambda interpreted per element), and per-position `substr` re-scans
  * the string making char n-grams O(n²) per document. These expressions
  * compute the identical [[PolyHash]] values in one O(n·k) pass per row
  * and stay inside whole-stage codegen.
  *
  * Both return the DISTINCT hash set (first-occurrence order), matching
  * the `array_distinct` the composed form applied.
  */
object TextHashes {

  private val P = PolyHash.P

  /** Distinct PolyHash of every `n`-code-point substring (matches
    * `array_distinct(transform(sequence(1, length-n+1), i ->
    * PolyHash(substr(text, i, n))))`; empty array when the text is
    * shorter than n).
    */
  def charNgramHashes(s: String, n: Int): ArrayData = {
    val cps = s.codePoints().toArray
    val len = cps.length
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + n <= len) {
      var h = cps(i).toLong
      var j = 1
      while (j < n) { h = (h * 31L + cps(i + j).toLong) % P; j += 1 }
      seen.add(h)
      i += 1
    }
    toArrayData(seen)
  }

  /** Distinct PolyHash of every k-word shingle (words = split on a single
    * space keeping empty tokens, exactly like `split(text, " ")`;
    * shingle = the k words joined with a single space — identical to the
    * slice/zip_with composition it replaces). Empty array when the text
    * has fewer than k words.
    */
  def wordShingleHashes(s: String, k: Int): ArrayData = {
    val toks = s.split(" ", -1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + k <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(PolyHash.hash(sb.toString))
      i += 1
    }
    toArrayData(seen)
  }

  /** EVERY k-word shingle as a string, in order, duplicates KEPT (unlike
    * [[wordShingleHashes]]): the frequency-counting form — exploding this
    * and counting is the canonical corpus-vocabulary shape. Same word
    * split (single space, empties kept) and same single-space join.
    */
  def wordShingles(s: String, k: Int): ArrayData = {
    val toks = s.split(" ", -1)
    val n = math.max(toks.length - k + 1, 0)
    val out = new Array[AnyRef](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** fastText-style hashed linear classifier score in one pass: features
    * are the DISTINCT unigram and bigram shingle hashes (the two sets
    * scored independently — no cross-set dedup, so a unigram hash that
    * collides with a bigram hash counts twice, identically on both
    * engines), each feature contributing weight `h % modulus - modulus/2`
    * (h ∈ [0, 2^31), so `%` is the same nonnegative remainder in Java and
    * DuckDB). Returns `[score, nFeatures]` — score is exact integer
    * arithmetic, |score| ≤ nFeatures × modulus/2 ≪ 2^63.
    */
  def linearScore(s: String, modulus: Int): ArrayData = {
    val half = modulus / 2
    var score = 0L
    var n = 0L
    var k = 1
    while (k <= 2) {
      val hs = wordShingleHashes(s, k)
      val m = hs.numElements()
      var i = 0
      while (i < m) { score += hs.getLong(i) % modulus - half; i += 1 }
      n += m
      k += 1
    }
    new GenericArrayData(Array(score, n))
  }

  /** Content-defined chunking at word granularity: a boundary falls
    * AFTER token i+w−1 whenever the w-token shingle hash starting at i
    * (the same [[PolyHash]] over the space-joined shingle as
    * [[wordShingleHashes]]) satisfies `h % divisor == 0` — the
    * rolling-hash cut rule of LBFS-style CDC (Muthitacharoen et al.,
    * SOSP 2001) with expected chunk length ≈ `divisor` tokens. Returns
    * the chunk strings in order (each chunk's tokens joined by a single
    * space, duplicates kept); fewer than w tokens → one chunk. The cut
    * decision depends only on a w-token window, which is what makes the
    * chunking SHIFT-ROBUST: an edit re-chunks only its neighborhood, so
    * chunk-hash dedup across document versions still matches everywhere
    * else — the property fixed-stride chunking (q43) lacks.
    */
  def cdcChunkStrings(s: String, w: Int, divisor: Int): ArrayData = {
    val toks = s.split(" ", -1)
    val n = toks.length
    val cut = new Array[Boolean](n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + w <= n) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (PolyHash.hash(sb.toString) % divisor == 0) cut(i + w) = true
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var start = 0
    var p = 1
    while (p <= n) {
      if (p == n || cut(p)) {
        sb.setLength(0)
        var q = start
        while (q < p) {
          if (q > start) sb.append(' ')
          sb.append(toks(q))
          q += 1
        }
        out += UTF8String.fromString(sb.toString)
        start = p
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def toArrayData(seen: java.util.LinkedHashSet[java.lang.Long]): ArrayData = {
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}

private[functions] abstract class HashArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
}

/** `charNgramHashes` as a codegen'd Catalyst expression. */
case class CharNgramHashes(child: Expression, n: Int) extends HashArrayExpression {
  require(n >= 1, "n-gram size must be >= 1")
  override def prettyName: String = "graft_char_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.charNgramHashes(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.charNgramHashes($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

object CharNgramHashes {
  def apply(c: Column, n: Int): Column =
    GraftShims.column(CharNgramHashes(GraftShims.expression(c), n))
}

/** `wordShingleHashes` as a codegen'd Catalyst expression. */
case class WordShingleHashes(child: Expression, k: Int) extends HashArrayExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def prettyName: String = "graft_word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.wordShingleHashes(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.wordShingleHashes($c.toString(), $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {
  def apply(c: Column, k: Int): Column =
    GraftShims.column(WordShingleHashes(GraftShims.expression(c), k))
}

/** `linearScore` as a codegen'd Catalyst expression. */
case class HashedLinearScore(child: Expression, modulus: Int) extends HashArrayExpression {
  require(modulus >= 2, "modulus must be >= 2")
  override def prettyName: String = "graft_hashed_linear_score"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.linearScore(input.asInstanceOf[UTF8String].toString, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.linearScore($c.toString(), $modulus)")

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

object HashedLinearScore {
  def apply(c: Column, modulus: Int): Column =
    GraftShims.column(HashedLinearScore(GraftShims.expression(c), modulus))
}

/** `cdcChunkStrings` as a codegen'd Catalyst expression. */
case class CdcChunkStrings(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression {
  require(w >= 1, "window size must be >= 1")
  require(divisor >= 2, "divisor must be >= 2")
  override def prettyName: String = "graft_cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.cdcChunkStrings(input.asInstanceOf[UTF8String].toString, w, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.cdcChunkStrings($c.toString(), $w, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkStrings =
    copy(child = newChild)
}

object CdcChunkStrings {
  def apply(c: Column, w: Int, divisor: Int): Column =
    GraftShims.column(CdcChunkStrings(GraftShims.expression(c), w, divisor))
}

/** `wordShingles` (all occurrences, strings) as a codegen'd expression. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def prettyName: String = "graft_word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.wordShingles(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.wordShingles($c.toString(), $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(c: Column, k: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(c), k))
}
