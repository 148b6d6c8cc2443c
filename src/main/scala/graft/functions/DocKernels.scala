package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document codegen kernels for the corpus-scan hot paths (round-18
  * optimization, guide §2.4 "remove shuffles outright" + §1.2 "per-task
  * work"): each kernel computes, in ONE pass over one document row, a
  * result the previous formulation assembled from an explode → corpus-wide
  * window/aggregate → (re)collect pipeline. Moving the per-document part of
  * the computation into the row kernel removes the corpus-scale exchanges
  * outright:
  *
  *  - [[BpeDocTokens]]: the q203/q211 subword stream. Replaces word
  *    posexplode → per-word regex + 8-step literal-replace merge chain →
  *    subword posexplode → `row_number` over a (source, doc_id) window —
  *    i.e. a full shuffle+sort of the corpus TOKEN stream — with an
  *    in-order token array whose posexplode position IS `tok_idx`.
  *  - [[WinnowFps]] / [[WinnowFpSpans]]: the q213/q218/q221/q225 winnowing
  *    selection (Schleimer et al. 2003). Replaces gram posexplode →
  *    sliding `min` window over a per-doc ordered frame (another full
  *    shuffle+sort of the gram stream) → `distinct` (a third exchange)
  *    with the identical selection computed per document.
  *  - [[PolyBucketCounts]]: the q156/q160/q161/q165 hashed-token bucket
  *    histogram. Replaces token explode → (doc, bucket) hash aggregate
  *    (an exchange carrying one row per token occurrence) with a per-doc
  *    count vector over the bounded bucket space.
  *  - [[PerceptronFeatures]]: q207's per-doc feature vector. Replaces
  *    unigram+bigram explodes → (doc, bucket) aggregate → per-doc window
  *    total → `collect_list` + sort + two higher-order `transform`s (all
  *    CodegenFallback) with the (buckets, per-mil values) arrays built
  *    directly.
  *
  * Every kernel reuses [[PolyHash.hash]] and the exact split/join
  * conventions of [[TextHashes]] (split on a single space keeping empty
  * tokens; shingles joined by a single space), so values are bit-identical
  * to the compositions they replace — DocKernelsSpec pins each against the
  * legacy DataFrame formulation, and the unchanged DuckDB oracles gate the
  * end results.
  */
object DocKernels {

  /** BPE-tokenize a whole document under a trained merge table: split on
    * single spaces (empties kept, like `split(text, " ")`); each word of
    * pure `a-z` starts as single-character tokens and applies each
    * (lhs, rhs) merge in order as one left-to-right non-overlapping pass
    * (identical to the bracketed-form literal `replace` it replaces: a
    * match consumes both tokens and scanning resumes AFTER the merged
    * token); any other word (including the empty word) is the single
    * `<unk>` token. `merges` is flattened [l0, r0, l1, r1, ...].
    *
    * Note the legacy guard was `rlike "^[a-z]+$"` under Java regex, where
    * `$` also matches before a single trailing `\n`; this kernel requires
    * every character in `a-z` (the RE2/DuckDB reading, which the oracle
    * gate already requires of the corpus — a trailing-`\n` word would
    * have failed the q203 oracle long before this kernel existed).
    */
  def bpeDocTokens(s: String, merges: Array[String]): ArrayData = {
    val words = s.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](words.length * 2)
    val unk = UTF8String.fromString("<unk>")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var pure = w.length > 0
      var ci = 0
      while (pure && ci < w.length) {
        val c = w.charAt(ci)
        if (c < 'a' || c > 'z') pure = false
        ci += 1
      }
      if (!pure) out += unk
      else {
        var toks = new Array[String](w.length)
        var i = 0
        while (i < w.length) { toks(i) = String.valueOf(w.charAt(i)); i += 1 }
        var n = toks.length
        var m = 0
        while (m < merges.length) {
          val l = merges(m)
          val r = merges(m + 1)
          var rd = 0
          var wr = 0
          while (rd < n) {
            if (rd + 1 < n && toks(rd) == l && toks(rd + 1) == r) {
              toks(wr) = l + r
              rd += 2
            } else {
              toks(wr) = toks(rd)
              rd += 1
            }
            wr += 1
          }
          n = wr
          m += 2
        }
        i = 0
        while (i < n) { out += UTF8String.fromString(toks(i)); i += 1 }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The winnowing-selected packed keys of one document, deduplicated in
    * first-occurrence order: gram hashes are [[PolyHash.hash]] over the
    * k-word shingle strings ([[TextHashes.wordShingles]] conventions),
    * key(pos) = hash·posPack + pos, and every window start
    * pos ∈ [0, max(ng − w, 0)] contributes min(key[pos .. pos+w−1])
    * (window truncated at the document end — identical to the
    * `rowsBetween(currentRow, w−1)` frame). Empty array when the document
    * has no grams (fewer than k words) — such docs contributed no rows in
    * the explode form either.
    */
  private def winnowSelectedKeys(s: String, k: Int, w: Int,
      posPack: Long): java.util.LinkedHashSet[java.lang.Long] = {
    val toks = s.split(" ", -1)
    val ng = toks.length - k + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (ng <= 0) return seen
    val keys = new Array[Long](ng)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      keys(i) = PolyHash.hash(sb.toString) * posPack + i
      i += 1
    }
    val limit = math.max(ng - w, 0)
    var pos = 0
    while (pos <= limit) {
      var mk = keys(pos)
      var j = pos + 1
      val end = math.min(pos + w, ng)
      while (j < end) {
        if (keys(j) < mk) mk = keys(j)
        j += 1
      }
      seen.add(mk)
      pos += 1
    }
    seen
  }

  /** Distinct winnowing fingerprints (`mk div posPack`) of one document,
    * first-occurrence order — the kernel form of
    * `winnowSelected(...).select(fp).distinct()`.
    */
  def winnowFps(s: String, k: Int, w: Int, posPack: Long): ArrayData = {
    val keys = winnowSelectedKeys(s, k, w, posPack)
    val fps = new java.util.LinkedHashSet[java.lang.Long]()
    val it = keys.iterator()
    while (it.hasNext) fps.add(it.next().longValue() / posPack)
    val out = new Array[Long](fps.size)
    val fit = fps.iterator()
    var i = 0
    while (fit.hasNext) { out(i) = fit.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Per-fingerprint first/last selected gram position of one document:
    * array of (fp, mn, mx) structs, fp in first-occurrence order — the
    * kernel form of the winnowFingerprintSpans groupBy.
    */
  def winnowFpSpans(s: String, k: Int, w: Int, posPack: Long): ArrayData = {
    val keys = winnowSelectedKeys(s, k, w, posPack)
    val spans = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
    val it = keys.iterator()
    while (it.hasNext) {
      val mk = it.next().longValue()
      val fp = mk / posPack
      val p = mk % posPack
      val cur = spans.get(fp)
      if (cur == null) spans.put(fp, Array(p, p))
      else {
        if (p < cur(0)) cur(0) = p
        if (p > cur(1)) cur(1) = p
      }
    }
    val out = new Array[AnyRef](spans.size())
    val eit = spans.entrySet().iterator()
    var i = 0
    while (eit.hasNext) {
      val e = eit.next()
      out(i) = new GenericInternalRow(
        Array[Any](e.getKey.longValue(), e.getValue()(0), e.getValue()(1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hashed-token bucket counts of one document: for every NON-EMPTY
    * whitespace token, bucket = [[PolyHash.hash]] % buckets; returns the
    * full `buckets`-length count vector (zeros included — callers filter
    * `cnt > 0` after posexplode to recover the aggregate rows).
    */
  def bucketCounts(s: String, buckets: Int): ArrayData = {
    val counts = new Array[Long](buckets)
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val b = (PolyHash.hash(s.substring(start, i)) % buckets).toInt
          counts(b) += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** q207's per-document feature vector: bucket counts of unigram AND
    * bigram shingle hashes (shingle strings per [[TextHashes.wordShingles]]
    * — empties kept, single-space join), per-mil-normalized
    * `(1000·c) div total`, emitted as two aligned arrays sorted by bucket
    * ascending with the bias feature (bucket = dim, value = 100) appended
    * — exactly the (bs, cs) the legacy agg + sort_array + transform
    * pipeline produced.
    */
  def perceptronFeatures(s: String, dim: Int): InternalRow = {
    val counts = new Array[Long](dim)
    val toks = s.split(" ", -1)
    var tot = 0L
    var k = 1
    while (k <= 2) {
      val n = toks.length - k + 1
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
        counts((PolyHash.hash(sb.toString) % dim).toInt) += 1
        tot += 1
        i += 1
      }
      k += 1
    }
    var nb = 0
    var b = 0
    while (b < dim) { if (counts(b) > 0) nb += 1; b += 1 }
    val bs = new Array[Long](nb + 1)
    val cs = new Array[Long](nb + 1)
    var o = 0
    b = 0
    while (b < dim) {
      if (counts(b) > 0) {
        bs(o) = b
        cs(o) = 1000L * counts(b) / tot
        o += 1
      }
      b += 1
    }
    bs(nb) = dim
    cs(nb) = 100L
    new GenericInternalRow(
      Array[Any](new GenericArrayData(bs), new GenericArrayData(cs)))
  }

  /** Distinct-set overlap counts of two long arrays: (|A ∩ B|, |A ∪ B|)
    * with set semantics identical to
    * `size(array_intersect(a, b))` / `size(array_union(a, b))` on
    * null-free arrays — without materializing either result array (the
    * LSH/PPJoin verify step runs this once per candidate pair).
    */
  def setOverlap(a: ArrayData, b: ArrayData): InternalRow = {
    val sa = new java.util.HashSet[java.lang.Long]()
    var i = 0
    val na = a.numElements()
    while (i < na) { sa.add(a.getLong(i)); i += 1 }
    val sb = new java.util.HashSet[java.lang.Long]()
    var inter = 0L
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      val v = b.getLong(i)
      if (sb.add(v) && sa.contains(v)) inter += 1
      i += 1
    }
    val uni = sa.size.toLong + sb.size.toLong - inter
    new GenericInternalRow(Array[Any](inter, uni))
  }

  /** q206's repeated-gram cover: every word position covered by a
    * k-gram occurrence whose gram already occurred at a LOWER position
    * in the same document — ⋃ {p..p+k−1 : gram(p) seen before p} — as a
    * sorted distinct position array. The kernel form of the
    * explode → (doc, gram) min-aggregate → join → extent explode →
    * distinct pipeline (all intra-doc, so it needs no exchange at all).
    */
  def repeatedGramCover(s: String, k: Int): ArrayData = {
    val toks = s.split(" ", -1)
    val ng = toks.length - k + 1
    if (ng <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[String]()
    val removed = new Array[Boolean](toks.length)
    val sb = new java.lang.StringBuilder
    var p = 0
    while (p < ng) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(p + j))
        j += 1
      }
      if (!seen.add(sb.toString)) {
        var q = p
        while (q < p + k) { removed(q) = true; q += 1 }
      }
      p += 1
    }
    var cnt = 0
    var i = 0
    while (i < removed.length) { if (removed(i)) cnt += 1; i += 1 }
    val out = new Array[Long](cnt)
    var o = 0
    i = 0
    while (i < removed.length) {
      if (removed(i)) { out(o) = i; o += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The splice rewrite of one document: tokens at the given 0-based
    * positions dropped, the rest re-joined with single spaces — the
    * kernel form of the interpreted `filter(tk, (_, i) =>
    * !array_contains(rpos, i))` + `array_join` projection.
    * `n_removed` is the LENGTH of the position array (the legacy
    * `size(rpos)` semantics — positions are distinct and in-range for
    * every caller).
    */
  def spliceByPositions(s: String, rpos: ArrayData): InternalRow = {
    val toks = s.split(" ", -1)
    val n = toks.length
    val removed = new Array[Boolean](n)
    val m = rpos.numElements()
    var i = 0
    while (i < m) {
      val v = rpos.getLong(i)
      if (v >= 0 && v < n) removed(v.toInt) = true
      i += 1
    }
    val sb = new java.lang.StringBuilder
    var first = true
    i = 0
    while (i < n) {
      if (!removed(i)) {
        if (!first) sb.append(' ')
        sb.append(toks(i))
        first = false
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, m.toLong, UTF8String.fromString(sb.toString)))
  }
}

private[functions] abstract class StringKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def nullIntolerant: Boolean = true
}

/** `bpeDocTokens` as a codegen'd Catalyst expression; the merge table is
  * a driver-side literal (a trained layout) carried into generated code
  * as a reference object.
  */
case class BpeDocTokens(child: Expression, merges: Seq[(String, String)])
    extends StringKernelExpression {
  override def prettyName: String = "graft_bpe_doc_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val flat: Array[String] =
    merges.flatMap(m => Seq(m._1, m._2)).toArray

  override protected def nullSafeEval(input: Any): Any =
    DocKernels.bpeDocTokens(input.asInstanceOf[UTF8String].toString, flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DocKernels.bpeDocTokens($c.toString(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDocTokens =
    copy(child = newChild)
}

object BpeDocTokens {
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    GraftShims.column(BpeDocTokens(GraftShims.expression(c), merges))
}

/** `winnowFps` as a codegen'd Catalyst expression. */
case class WinnowFps(child: Expression, k: Int, w: Int, posPack: Long)
    extends StringKernelExpression {
  require(k >= 1 && w >= 1 && posPack >= 1)
  override def prettyName: String = "graft_winnow_fps"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    DocKernels.winnowFps(input.asInstanceOf[UTF8String].toString, k, w, posPack)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DocKernels.winnowFps($c.toString(), $k, $w, ${posPack}L)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  def apply(c: Column, k: Int, w: Int, posPack: Long): Column =
    GraftShims.column(WinnowFps(GraftShims.expression(c), k, w, posPack))
}

/** `winnowFpSpans` as a codegen'd Catalyst expression. */
case class WinnowFpSpans(child: Expression, k: Int, w: Int, posPack: Long)
    extends StringKernelExpression {
  require(k >= 1 && w >= 1 && posPack >= 1)
  override def prettyName: String = "graft_winnow_fp_spans"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fp", LongType, nullable = false),
    StructField("mn", LongType, nullable = false),
    StructField("mx", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    DocKernels.winnowFpSpans(
      input.asInstanceOf[UTF8String].toString, k, w, posPack)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DocKernels.winnowFpSpans($c.toString(), $k, $w, ${posPack}L)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpSpans =
    copy(child = newChild)
}

object WinnowFpSpans {
  def apply(c: Column, k: Int, w: Int, posPack: Long): Column =
    GraftShims.column(WinnowFpSpans(GraftShims.expression(c), k, w, posPack))
}

/** `bucketCounts` as a codegen'd Catalyst expression. */
case class PolyBucketCounts(child: Expression, buckets: Int)
    extends StringKernelExpression {
  require(buckets >= 1)
  override def prettyName: String = "graft_poly_bucket_counts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    DocKernels.bucketCounts(input.asInstanceOf[UTF8String].toString, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DocKernels.bucketCounts($c.toString(), $buckets)")

  override protected def withNewChildInternal(newChild: Expression): PolyBucketCounts =
    copy(child = newChild)
}

object PolyBucketCounts {
  def apply(c: Column, buckets: Int): Column =
    GraftShims.column(PolyBucketCounts(GraftShims.expression(c), buckets))
}

/** `perceptronFeatures` as a codegen'd Catalyst expression. */
case class PerceptronFeatures(child: Expression, dim: Int)
    extends StringKernelExpression {
  require(dim >= 1)
  override def prettyName: String = "graft_perceptron_features"
  override def dataType: DataType = StructType(Seq(
    StructField("bs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("cs", ArrayType(LongType, containsNull = false), nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    DocKernels.perceptronFeatures(input.asInstanceOf[UTF8String].toString, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DocKernels.perceptronFeatures($c.toString(), $dim)")

  override protected def withNewChildInternal(newChild: Expression): PerceptronFeatures =
    copy(child = newChild)
}

object PerceptronFeatures {
  def apply(c: Column, dim: Int): Column =
    GraftShims.column(PerceptronFeatures(GraftShims.expression(c), dim))
}

/** `repeatedGramCover` as a codegen'd Catalyst expression. */
case class RepeatedGramCover(child: Expression, k: Int)
    extends StringKernelExpression {
  require(k >= 1)
  override def prettyName: String = "graft_repeated_gram_cover"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    DocKernels.repeatedGramCover(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DocKernels.repeatedGramCover($c.toString(), $k)")

  override protected def withNewChildInternal(newChild: Expression): RepeatedGramCover =
    copy(child = newChild)
}

object RepeatedGramCover {
  def apply(c: Column, k: Int): Column =
    GraftShims.column(RepeatedGramCover(GraftShims.expression(c), k))
}

/** `spliceByPositions` as a codegen'd Catalyst expression:
  * (text STRING, rpos ARRAY<BIGINT>) → (n_tokens_before, n_removed,
  * clean_text).
  */
case class SpliceByPositions(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_splice_by_positions"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
        (right.dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, ARRAY<BIGINT>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens_before", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DocKernels.spliceByPositions(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.DocKernels.spliceByPositions($l.toString(), $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpliceByPositions =
    copy(left = newLeft, right = newRight)
}

object SpliceByPositions {
  def apply(text: Column, rpos: Column): Column =
    GraftShims.column(SpliceByPositions(
      GraftShims.expression(text), GraftShims.expression(rpos)))
}

/** `setOverlap` as a codegen'd Catalyst expression:
  * (ARRAY<BIGINT>, ARRAY<BIGINT>) → (inter, uni) distinct-set counts.
  */
case class SetOverlap(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_set_overlap"

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = StructType(Seq(
    StructField("inter", LongType, nullable = false),
    StructField("uni", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DocKernels.setOverlap(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.DocKernels.setOverlap($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetOverlap =
    copy(left = newLeft, right = newRight)
}

object SetOverlap {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(SetOverlap(
      GraftShims.expression(a), GraftShims.expression(b)))
}
