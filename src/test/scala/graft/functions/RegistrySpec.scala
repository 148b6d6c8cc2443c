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

  test("the cosine/ANN path is expressible end-to-end from SQL") {
    import spark.implicits._
    Registry.register(spark)
    Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.6f, 0.8f)), (2, Seq(-1.0f, 0.25f)))
      .toDF("vec_id", "vec").createOrReplaceTempView("cos_probe")

    val viaSql = spark.sql(
      """SELECT vec_id,
        | graft_cosine(graft_quantize(vec), graft_quantize(array(0.6D, 0.8D))) AS cs,
        | graft_nearest_centroid(graft_quantize(vec),
        |   array(array(1000000L, 0L), array(0L, 1000000L))) AS cid
        | FROM cos_probe ORDER BY vec_id""".stripMargin).collect()
    val viaApi = spark.table("cos_probe").select(
        col("vec_id"),
        Exact.cosine(col("vec"), typedlit(Seq(0.6d, 0.8d))).as("cs"),
        NearestCentroid(Quantize(col("vec")),
          Seq(Seq(1000000L, 0L), Seq(0L, 1000000L))).as("cid"))
      .orderBy("vec_id").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    // sanity: vec_id=1 is exactly the query direction → cosine 1.0
    assert(viaSql(1).getDouble(1) == 1.0d)
  }

  test("the extensions class injects every registered function name") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must not throw
    // names stay in sync between the two registration paths
    assert(Registry.builders.map(_._1).distinct.size == Registry.builders.size)
  }
}
