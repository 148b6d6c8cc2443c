package graft.functions

import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** SQL surface for the engine's custom Catalyst expressions: the same
  * codegen'd kernels the DataFrame operators use, callable from
  * `spark.sql(...)` / `expr(...)` / SQL lambda bodies.
  *
  * Two registration paths:
  *  - [[Registry.register]] on a live session (temp functions);
  *  - [[graft.GraftExtensions]] via
  *    `spark.sql.extensions=graft.GraftExtensions` for cluster-wide
  *    injection at session build time.
  */
object Registry {

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue
  }

  /** Literal ARRAY<ARRAY<BIGINT>> → the codebook a [[NearestCentroid]]
    * carries (it travels inside the expression, the broadcast every IVF
    * does — K·dim longs, trivially small).
    */
  private def codebookArg(e: Expression): Seq[Seq[Long]] = {
    require(e.foldable, "centroids must be a literal array of arrays")
    e.eval().asInstanceOf[ArrayData]
      .toObjectArray(ArrayType(LongType))
      .map(_.asInstanceOf[ArrayData].toLongArray().toSeq).toSeq
  }

  /** Literal ARRAY<BIGINT> (for [[SqEncode]]'s per-dimension bounds). */
  private def longsArg(e: Expression, what: String): Seq[Long] = {
    require(e.foldable, s"$what must be a literal array of BIGINT")
    e.eval().asInstanceOf[ArrayData].toLongArray().toSeq
  }

  /** Literal ARRAY<ARRAY<ARRAY<BIGINT>>> → [[PqEncode]]'s M per-subspace
    * codebooks (M·K·(dim/M) longs — the same in-expression broadcast
    * shape as [[NearestCentroid]], one level deeper).
    */
  private def codebooks3Arg(e: Expression): Seq[Seq[Seq[Long]]] = {
    require(e.foldable, "codebooks must be a literal array of array of arrays")
    e.eval().asInstanceOf[ArrayData]
      .toObjectArray(ArrayType(ArrayType(LongType)))
      .map(_.asInstanceOf[ArrayData]
        .toObjectArray(ArrayType(LongType))
        .map(_.asInstanceOf[ArrayData].toLongArray().toSeq).toSeq).toSeq
  }

  /** Cosine from two quantized (ARRAY<BIGINT>) vectors — the exact
    * [[Exact.cosineFromQuantized]] tree, so the SQL surface can run the
    * documented cosine/ANN path end to end: the only floating-point
    * steps are one sqrt+divide over exact integer dots.
    */
  private def cosineExpr(qa: Expression, qb: Expression): Expression =
    Divide(
      Cast(QDot(qa, qb), DoubleType),
      Multiply(
        Sqrt(Cast(QDot(qa, qa), DoubleType)),
        Sqrt(Cast(QDot(qb, qb), DoubleType))))

  /** (name, builder) for every SQL-exposed expression. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_polyhash" -> (es => PolyHash(es.head)),
    "graft_char_ngram_hashes" ->
      (es => CharNgramHashes(es.head, intArg(es(1), "n"))),
    "graft_word_shingle_hashes" ->
      (es => WordShingleHashes(es.head, intArg(es(1), "k"))),
    "graft_word_shingles" ->
      (es => WordShingles(es.head, intArg(es(1), "k"))),
    "graft_minhash_sig" ->
      (es => MinHashSig(es.head, intArg(es(1), "numHashes"))),
    "graft_band_hash" ->
      (es => BandHashes(es.head, intArg(es(1), "numBands"))),
    "graft_quantize" -> (es => Quantize(es.head)),
    "graft_qdot" -> (es => QDot(es.head, es(1))),
    "graft_cosine" -> (es => cosineExpr(es.head, es(1))),
    "graft_nearest_centroid" ->
      (es => NearestCentroid(es.head, codebookArg(es(1)))),
    "graft_hashed_linear_score" ->
      (es => HashedLinearScore(es.head, intArg(es(1), "modulus"))),
    "graft_cdc_chunks" ->
      (es => CdcChunkStrings(es.head, intArg(es(1), "w"),
        intArg(es(2), "divisor"))),
    "graft_pq_encode" -> (es => PqEncode(es.head, codebooks3Arg(es(1)))),
    "graft_pq_adc" -> (es => PqAdc(es.head, codebookArg(es(1)))),
    "graft_sq_encode" ->
      (es => SqEncode(es.head, longsArg(es(1), "mins"),
        longsArg(es(2), "spans"))),
    "graft_edit_within" ->
      (es => EditWithin(es.head, es(1), intArg(es(2), "bound"))))

  /** Register everything as temp functions on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftShims.registerFunction(spark, name, b)
    }

  /** Injections for [[graft.GraftExtensions]]. */
  private[graft] def inject(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[Registry.type].getName, name),
        b))
    }
}
