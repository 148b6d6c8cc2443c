package graft.streaming

import graft.SparkTestSession
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the opt-in hot-hash tombstone guard (`maxStoredDf`):
  *
  *  1. A bound no hash ever crosses is SEMANTICALLY INVISIBLE: the
  *     capped ingest reproduces the uncapped path — and therefore batch
  *     `substringRemove(…, Long.MaxValue)` — bit-exactly on the real
  *     corpus.
  *  2. A forced-hot hash is tombstoned when its stored occurrence count
  *     crosses the bound: later copies are KEPT (the documented
  *     semantics change), the hash's stored rows stop growing (the
  *     100 TB lifetime bound), the stream stays loss-free, and compact
  *     purges the tombstoned spans.
  */
class CleanStreamGuardSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[(Long, Long, Long, String)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq.sorted

  test("an uncrossed bound is bit-identical to the uncapped path and to batch") {
    import spark.implicits._
    val docsDf = graft.Tables.load(spark, dir, "documents")
    val docs = docsDf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val store = CleanStream.build(spark, "guardeq")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    docs.grouped(150).foreach { g =>
      out ++= rows(CleanStream.cleanAndIngest(spark, store,
        g.toSeq.toDF("doc_id", "text"), minWords = 8,
        maxStoredDf = 1000000L))
    }
    val batch = rows(Dedup.substringRemove(docsDf, 8, Long.MaxValue))
    assert(out.sorted == batch,
      "capped ingest under an uncrossed bound diverged from batch")
    assert(spark.table(store.tombTable).count() == 0,
      "an uncrossed bound must tombstone nothing")
  }

  test("a hot hash is tombstoned, later copies kept, store growth stops") {
    import spark.implicits._
    val p = "g1 g2 g3 g4 g5 g6 g7 g8 g9 g10" // 10 words → 3 span hashes
    val store = CleanStream.build(spark, "guardhot")
    def ingest(id: Long): Seq[(Long, Long, Long, String)] =
      rows(CleanStream.cleanAndIngest(spark, store,
        Seq((id, p)).toDF("doc_id", "text"), minWords = 8,
        maxStoredDf = 2L))

    assert(ingest(1L) == Seq((1L, 10L, 0L, p)), "first arrival keeps")
    assert(ingest(2L) == Seq((2L, 10L, 10L, "")), "second copy removed")
    // doc 3 still removes (stored df 2 ≤ bound while probing), but its
    // append pushes every span hash to df 3 > 2 → tombstoned
    assert(ingest(3L) == Seq((3L, 10L, 10L, "")), "third copy removed")
    assert(spark.table(store.tombTable).count() == 3L,
      "all 3 span hashes must be tombstoned after crossing the bound")
    val storedAfterHot = spark.table(store.posTable).count()
    assert(storedAfterHot == 9L, "3 docs × 3 span rows stored")

    // doc 4: the passage's hashes are tombstoned — KEPT (the documented
    // semantics change), nothing appended, store growth stopped
    assert(ingest(4L) == Seq((4L, 10L, 0L, p)),
      "a copy of a tombstoned passage must be kept")
    assert(spark.table(store.posTable).count() == storedAfterHot,
      "tombstoned spans must not accumulate in the store")
    assert(spark.table(store.docTable).count() == 4L,
      "the manifest must stay loss-free")

    // compact purges the dead spans; behavior afterwards is unchanged
    CleanStream.compact(spark, store)
    assert(spark.table(store.posTable).count() == 0L,
      "compact must purge tombstoned span rows")
    assert(spark.table(store.tombTable).count() == 3L)
    assert(ingest(5L) == Seq((5L, 10L, 0L, p)),
      "post-compact copies of the tombstoned passage stay kept")

    // an unrelated passage still dedups normally under the same bound
    val q = "u1 u2 u3 u4 u5 u6 u7 u8"
    assert(rows(CleanStream.cleanAndIngest(spark, store,
      Seq((10L, q)).toDF("doc_id", "text"), 8, 2L)) ==
      Seq((10L, 8L, 0L, q)))
    assert(rows(CleanStream.cleanAndIngest(spark, store,
      Seq((11L, q)).toDF("doc_id", "text"), 8, 2L)) ==
      Seq((11L, 8L, 8L, "")),
      "cold hashes must keep dedup semantics under the guard")
  }
}
