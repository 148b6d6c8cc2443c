package graft.functions

import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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

  /** (name, builder) for every SQL-exposed expression. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_polyhash" -> (es => PolyHash(es.head)),
    "graft_char_ngram_hashes" ->
      (es => CharNgramHashes(es.head, intArg(es(1), "n"))),
    "graft_word_shingle_hashes" ->
      (es => WordShingleHashes(es.head, intArg(es(1), "k"))),
    "graft_quantize" -> (es => Quantize(es.head)),
    "graft_qdot" -> (es => QDot(es.head, es(1))))

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
