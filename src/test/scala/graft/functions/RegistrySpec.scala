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
        | graft_word_shingles(text, 2) AS wg,
        | graft_qdot(graft_quantize(vec), graft_quantize(vec)) AS qd
        | FROM reg_probe""".stripMargin).collect()
    val viaApi = spark.table("reg_probe").select(
      PolyHash(col("text")).as("h"),
      CharNgramHashes(col("text"), 3).as("cg"),
      WordShingleHashes(col("text"), 2).as("ws"),
      WordShingles(col("text"), 2).as("wg"),
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

  test("the full LSH pipeline is expressible from SQL and matches the aggregate pipeline") {
    import spark.implicits._
    Registry.register(spark)
    // near-identical pair (0,1) + an unrelated doc + a degenerate short doc
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different content about spark catalyst expressions"),
      (3L, "too short"))
      .toDF("doc_id", "text").createOrReplaceTempView("lsh_probe")

    // scalar kernels: signature per row, banded, self-joined on
    // (band, band hash) — the SQL user's LSH pipeline
    val sqlPairs = spark.sql(
      """WITH sig AS (
        |  SELECT doc_id,
        |    graft_minhash_sig(graft_word_shingle_hashes(text, 3), 16) AS sig,
        |    size(graft_word_shingle_hashes(text, 3)) AS n_shingles
        |  FROM lsh_probe),
        | bands AS (
        |  SELECT doc_id, posexplode(graft_band_hash(sig, 4)) AS (b, bh)
        |  FROM sig WHERE n_shingles > 0)
        | SELECT DISTINCT a.doc_id AS doc_id_1, c.doc_id AS doc_id_2
        | FROM bands a JOIN bands c
        |   ON a.b = c.b AND a.bh = c.bh AND a.doc_id < c.doc_id
        | ORDER BY doc_id_1, doc_id_2""".stripMargin)
      .as[(Long, Long)].collect().toSeq

    // the aggregate pipeline's signatures on the same docs (the q22
    // formulation: explode → per-permutation min)
    val sigSql = spark.sql(
      """SELECT doc_id, graft_minhash_sig(
        |  graft_word_shingle_hashes(text, 3), 16) AS sig
        | FROM lsh_probe ORDER BY doc_id""".stripMargin)
      .as[(Long, Seq[Long])].collect()
    val mins = (0 until 16).map(j => min(
      (lit(MinHash.permA(j)) * col("h") + lit(MinHash.permB(j))) % MinHash.P)
      .as(s"mh$j"))
    val sigAgg = spark.table("lsh_probe")
      .select(col("doc_id"), explode(WordShingleHashes(col("text"), 3)).as("h"))
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until 16).map(j => col(s"mh$j")): _*).as("sig"))
      .orderBy("doc_id")
      .as[(Long, Seq[Long])].collect()
    // doc 3 has zero shingles: scalar kernel signs it as all-P, the
    // aggregate drops it — compare on the docs both sides sign
    val aggMap = sigAgg.toMap
    sigSql.foreach { case (id, sig) =>
      aggMap.get(id).foreach(aggSig => assert(sig == aggSig, s"doc $id"))
    }
    assert(sigSql.find(_._1 == 3L).get._2.forall(_ == MinHash.P))
    // the near-identical pair collides in at least one band; no other pair
    assert(sqlPairs == Seq((0L, 1L)))
  }

  test("a SQL-only chunk-dedup pipeline matches the q126 DataFrame path") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    Registry.register(spark)
    Seq(
      (0L, "alpha beta gamma alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words with no shared chunk content at all"),
      (3L, "short"))
      .toDF("doc_id", "text").createOrReplaceTempView("chunk_probe")
    val (w, d) = (TextAnalysis.CdcWindow, TextAnalysis.CdcDivisor)
    // the SQL user's chunk store: cut → hash → per-hash summary — the
    // exact q126 chain, with the kernels coming off the registry
    val viaSql = spark.sql(
      s"""WITH ch AS (
         |  SELECT explode(graft_cdc_chunks(text, $w, $d)) AS chunk
         |  FROM chunk_probe),
         | per AS (
         |  SELECT graft_polyhash(chunk) AS h, COUNT(*) AS occ,
         |    MIN(CAST(size(split(chunk, ' ')) AS BIGINT)) AS tok
         |  FROM ch GROUP BY h)
         | SELECT * FROM per ORDER BY h""".stripMargin).collect()
    val viaApi = TextAnalysis.chunkSummary(spark.table("chunk_probe"))
      .orderBy("h").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    // the identical pair actually shares chunks (occ > 1 somewhere)
    assert(viaSql.exists(_.getLong(1) > 1L))
  }

  test("a SQL-only quality-score pipeline matches the q80 DataFrame path") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    Registry.register(spark)
    Seq((0L, "the quick brown fox jumps over the lazy dog"),
        (1L, "spark catalyst expressions generate java bytecode"),
        (2L, ""))
      .toDF("doc_id", "text").createOrReplaceTempView("score_probe")
    val m = TextAnalysis.ClassifierModulus
    val viaSql = spark.sql(
      s"""WITH f AS (
         |  SELECT doc_id, graft_hashed_linear_score(text, $m) AS fv
         |  FROM score_probe)
         | SELECT doc_id, element_at(fv, 1) AS score,
         |   element_at(fv, 2) AS n_features,
         |   CASE WHEN element_at(fv, 1) >= 0 THEN CAST(1 AS BIGINT)
         |        ELSE CAST(0 AS BIGINT) END AS keep
         | FROM f ORDER BY doc_id""".stripMargin).collect()
    val f = HashedLinearScore(col("text"), m)
    val viaApi = spark.table("score_probe")
      .select(col("doc_id"), f.as("f"))
      .select(col("doc_id"),
        element_at(col("f"), 1).as("score"),
        element_at(col("f"), 2).as("n_features"))
      .withColumn("keep", when(col("score") >= 0, 1L).otherwise(0L))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("the PQ and SQ kernels are callable from SQL and match the Column API") {
    import spark.implicits._
    Registry.register(spark)
    // 4-dim quantized vectors, M=2 subspaces × K=2 centroids × ds=2
    Seq((0L, Seq(1L, 2L, 95L, 1L)), (1L, Seq(99L, 99L, 1L, 48L)),
        (2L, Seq(50L, 50L, 40L, 30L)))
      .toDF("vec_id", "qv").createOrReplaceTempView("pq_probe")
    val cb = Seq(Seq(Seq(0L, 0L), Seq(100L, 100L)),
      Seq(Seq(0L, 50L), Seq(90L, 0L)))
    val adcTab = Seq(Seq(7L, 11L), Seq(13L, 17L))
    val mins = Seq(0L, 0L, 0L, 0L)
    val spans = Seq(100L, 100L, 95L, 50L)
    val viaSql = spark.sql(
      """SELECT vec_id,
        | graft_pq_encode(qv, array(array(array(0L, 0L), array(100L, 100L)),
        |   array(array(0L, 50L), array(90L, 0L)))) AS codes,
        | graft_pq_adc(graft_pq_encode(qv,
        |   array(array(array(0L, 0L), array(100L, 100L)),
        |     array(array(0L, 50L), array(90L, 0L)))),
        |   array(array(7L, 11L), array(13L, 17L))) AS adc,
        | graft_sq_encode(qv, array(0L, 0L, 0L, 0L),
        |   array(100L, 100L, 95L, 50L)) AS sq
        | FROM pq_probe ORDER BY vec_id""".stripMargin).collect()
    val viaApi = spark.table("pq_probe").select(
        col("vec_id"),
        PqEncode(col("qv"), cb).as("codes"),
        PqAdc(PqEncode(col("qv"), cb), adcTab).as("adc"),
        SqEncode(col("qv"), mins, spans).as("sq"))
      .orderBy("vec_id").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    // sanity: row 0 is (near-c0, near-c1) → codes [0,1], adc 7+17=24
    assert(viaSql(0).getSeq[Long](1) == Seq(0L, 1L))
    assert(viaSql(0).getLong(2) == 24L)
  }

  test("the extensions class injects every registered function name") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must not throw
    // names stay in sync between the two registration paths
    assert(Registry.builders.map(_._1).distinct.size == Registry.builders.size)
  }
}
