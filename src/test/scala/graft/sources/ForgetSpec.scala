package graft.sources

import graft.SparkTestSession
import graft.operators.{ProductQuant, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compliance delete across the persisted layouts: a purged store must
  * be BIT-IDENTICAL to one rebuilt from the remaining corpus (under the
  * same frozen codebooks for the vector layouts) — the strongest
  * erasure proof: nothing derived from the purged documents remains,
  * because the purged store is indistinguishable from one that never
  * saw them. Purges must also be idempotent (a crashed-and-retried
  * delete batch re-applies harmlessly).
  */
class ForgetSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def docs() =
    graft.Tables.load(spark, dir, "documents").select("doc_id", "text")

  private def embs() =
    graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding", "label")

  private def rows(table: String): Seq[Seq[Any]] = {
    val df = spark.table(table)
    df.collect()
      .map(_.toSeq.map {
        case s: scala.collection.Seq[_] => s.toList
        case v => v
      })
      .sortBy(_.mkString("|")).toSeq
  }

  test("signature store: purge ≡ rebuild from remaining docs, idempotently") {
    val t = SignatureStore.build(spark, docs(), s"fgsig${System.nanoTime()}")
    val ids = spark.table(t.sig).select("doc_id").orderBy("doc_id")
      .limit(3).collect().map(_.getLong(0)).toSeq
    assert(ids.size == 3)
    Forget.signatures(spark, t, ids)
    val rebuilt = SignatureStore.build(spark,
      docs().filter(!col("doc_id").isin(ids: _*)),
      s"fgsigre${System.nanoTime()}")
    assert(rows(t.sig) == rows(rebuilt.sig),
      "purged sig table must equal a rebuild from the remaining docs")
    assert(rows(t.bands) == rows(rebuilt.bands),
      "purged bands table must equal a rebuild from the remaining docs")
    // the store still serves: full-corpus pairs match the rebuilt store's
    val p1 = SignatureStore.pairs(spark, t).collect().map(_.toSeq).sortBy(_.mkString)
    val p2 = SignatureStore.pairs(spark, rebuilt).collect().map(_.toSeq).sortBy(_.mkString)
    assert(p1.toSeq == p2.toSeq)
    // idempotent: re-applying the same delete batch changes nothing
    Forget.signatures(spark, t, ids)
    assert(rows(t.sig) == rows(rebuilt.sig))
    assert(rows(t.bands) == rows(rebuilt.bands))
  }

  test("inverted index: purge ≡ rebuild, and BM25 serves the rebuilt scores") {
    val t = IndexStore.build(spark, docs(), s"fgidx${System.nanoTime()}")
    val ids = Seq(1L, 4L, 9L)
    Forget.index(spark, t, ids)
    val rebuilt = IndexStore.build(spark,
      docs().filter(!col("doc_id").isin(ids: _*)),
      s"fgidxre${System.nanoTime()}")
    assert(rows(t.postings) == rows(rebuilt.postings))
    assert(rows(t.manifest) == rows(rebuilt.manifest))
    // serve-time stats (N, D, df) derive from the store, so the purged
    // index scores EXACTLY like the rebuilt one — no stale-df window
    val s1 = graft.operators.Retrieval.bm25ServeFromIndex(spark, t)
      .collect().map(_.toSeq).toSeq
    val s2 = graft.operators.Retrieval.bm25ServeFromIndex(spark, rebuilt)
      .collect().map(_.toSeq).toSeq
    assert(s1 == s2)
    assert(s1.nonEmpty)
  }

  test("sign-LSH embedding index: purge ≡ rebuild from remaining vectors") {
    val table = EmbeddingIndex.build(spark,
      embs().select("vec_id", "embedding"), s"fgemb${System.nanoTime()}")
    val ids = Seq(0L, 2L, 5L)
    Forget.embeddingIndex(spark, table, ids)
    val rebuilt = EmbeddingIndex.build(spark,
      embs().select("vec_id", "embedding")
        .filter(!col("vec_id").isin(ids: _*)),
      s"fgembre${System.nanoTime()}")
    assert(rows(table) == rows(rebuilt))
  }

  test("clustered serving layout: purge ≡ rebuild under the frozen codebook") {
    val cents = Similarity.ensureTrained(spark, dir)
    val table = Similarity.buildClusteredEmpty(spark,
      s"fgclu${System.nanoTime()}")
    Similarity.appendClustered(spark, table, embs(), cents)
    val ids = Seq(0L, 3L, 8L)
    Forget.clustered(spark, table, ids)
    val rebuilt = Similarity.buildClusteredEmpty(spark,
      s"fgclure${System.nanoTime()}")
    Similarity.appendClustered(spark, rebuilt,
      embs().filter(!col("vec_id").isin(ids: _*)), cents)
    assert(rows(table) == rows(rebuilt))
    assert(spark.table(table).filter(col("vec_id").isin(ids: _*)).count() == 0)
  }

  test("PQ codes: purge ≡ rebuild under the frozen codebooks") {
    val cents = Similarity.ensureTrained(spark, dir)
    val cb = ProductQuant.ensureTrained(spark, dir)
    val emb = embs().select("vec_id", "embedding")
    val table = ProductQuant.build(spark, emb, cents, cb,
      s"fgpq${System.nanoTime()}")
    val ids = Seq(1L, 6L, 7L)
    Forget.codes(spark, table, ids)
    val rebuilt = ProductQuant.build(spark,
      emb.filter(!col("vec_id").isin(ids: _*)), cents, cb,
      s"fgpqre${System.nanoTime()}")
    assert(rows(table) == rows(rebuilt))
  }
}
