package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface must compute exactly what the Column API computes. */
class RegistrySpec extends AnyFunSuite with SparkTestSession {

  test("registered SQL functions match the Column-API expressions") {
    import spark.implicits._
    Registry.register(spark)
    Seq(("alpha beta gamma delta", Seq(0.25f, -0.5f)),
        ("", Seq.empty[Float]))
      .toDF("text", "vec").createOrReplaceTempView("reg_probe")

    val viaSql = spark.sql(
      """SELECT graft_polyhash(text) AS h,
        | graft_char_ngram_hashes(text, 3) AS cg,
        | graft_word_shingle_hashes(text, 2) AS ws,
        | graft_qdot(graft_quantize(vec), graft_quantize(vec)) AS qd
        | FROM reg_probe""".stripMargin).collect()
    val viaApi = spark.table("reg_probe").select(
      PolyHash(col("text")).as("h"),
      CharNgramHashes(col("text"), 3).as("cg"),
      WordShingleHashes(col("text"), 2).as("ws"),
      QDot(Quantize(col("vec")), Quantize(col("vec"))).as("qd")).collect()
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("the extensions class injects every registered function name") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must not throw
    // names stay in sync between the two registration paths
    assert(Registry.builders.map(_._1).distinct.size == Registry.builders.size)
  }
}
