package graft.sources

import graft.Tables
import graft.functions.PolyHash
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted winnowing-fingerprint store — the incremental form of
  * q213's MOSS-style local near-dup detection, completing the pattern
  * the other dedup family members already have ([[SignatureStore]] for
  * MinHash bands, SpanStream for positioned spans, ChunkStream for CDC
  * chunks): a corpus that grows continuously should not re-winnow
  * 100 TB to ask "does this new document share a passage with anything
  * we already hold".
  *
  * One table `fp(doc_id, fp)` — each document's winnowing-selected
  * fingerprints ([[Dedup.winnowFingerprints]], the ONE selection
  * definition shared with the gated query) — bucketed by `fp`, the
  * probe key. Probing a micro-batch therefore shuffles ONLY the batch
  * side; the store-side equi-join, the df-cap aggregate and the
  * store-to-store self-join are all exchange-free however large the
  * corpus.
  *
  * Df-cap note: the noise rule (drop fingerprints shared by > cap
  * docs) is evaluated against the CURRENT corpus, so [[probe]]'s
  * per-batch verdicts legitimately depend on ingest order — a
  * fingerprint can cross the cap later (exactly as a production MOSS
  * index behaves); [[pairs]] after full ingest is order-independent
  * and bit-identical to the batch q213 (WinnowStoreSpec pins it). The
  * df aggregate here re-derives from the fp table per call
  * (exchange-free on the bucketing); the 100 TB deployment maintains
  * it as an additive (fp, delta) side table per the FreqStream
  * pattern — the q172-style swap note.
  */
object WinnowStore {

  val Buckets = 16

  final case class Store(fp: String)

  /** Create (or overwrite) the store from a (doc_id, text) corpus. */
  def build(s: SparkSession, docs: DataFrame, tag: String): Store = {
    val t = Store(s"graft_winnow_$tag")
    Bucketed.dropStale(s, t.fp)
    Bucketed.write(Dedup.winnowFingerprints(docs), t.fp, Buckets, "fp")
    t
  }

  // store per sf directory, memoized like SignatureStore.prepared
  private val prepared = scala.collection.concurrent.TrieMap.empty[String, Store]
  // Serialize first-use builds: TrieMap.getOrElseUpdate may run a racing
  // thunk twice, and the loser's dropStale+write clobbers the winner's
  // table mid-read (the DupGraph/IndexStore buildLock rule).
  private val buildLock = new Object

  /** The store over `dir`'s documents table (built on first use). */
  def ensure(s: SparkSession, dir: String): Store = buildLock.synchronized {
    prepared.getOrElseUpdate(dir, {
      val tag = java.lang.Long.toHexString(PolyHash.hash(dir))
      build(s, Tables.load(s, dir, "documents").select("doc_id", "text"), tag)
    })
  }

  /** Upsert a (doc_id, text) batch with the SAME bucket spec (appends
    * add files per bucket, never reshuffle existing ones). IDEMPOTENT
    * per doc_id — the SignatureStore.append contract: a replayed
    * micro-batch's doc_ids anti-join against the store's distinct
    * doc_id set and fold nothing twice.
    */
  def append(s: SparkSession, t: Store, docs: DataFrame): Unit = {
    val fresh = docs.join(
      s.table(t.fp).select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    Dedup.winnowFingerprints(fresh)
      .write.bucketBy(Buckets, "fp").sortBy("fp")
      .mode("append").saveAsTable(t.fp)
    s.catalog.refreshTable(t.fp)
  }

  /** Compact per-batch append files to one file set per bucket
    * ([[Bucketed.compact]] — rows, bucketing and probe plans unchanged).
    */
  def compact(s: SparkSession, t: Store): Unit =
    Bucketed.compact(s, t.fp, Buckets, "fp")

  /** Heal a compaction swap that crashed mid-rename. */
  def recover(s: SparkSession, t: Store): Unit =
    Bucketed.recover(s, t.fp)

  /** Full-corpus scored near-dup pairs FROM THE STORE — the q213
    * result without touching raw text: df cap, self-join and scoring
    * all run over the fp-bucketed table (exchange-free store side),
    * through the SAME [[Dedup.winnowCapped]]/[[Dedup.winnowPairsFrom]]
    * plans the gated query runs over its scratch flush.
    */
  def pairs(s: SparkSession, t: Store): DataFrame =
    Dedup.winnowPairsFrom(Dedup.winnowCapped(s.table(t.fp)))

  /** Probe a (doc_id, text) micro-batch against the store BEFORE
    * appending it: every `(doc_id, dup_of, shared, nfp_new)` where
    * `dup_of` is an already-stored document sharing ≥
    * [[Dedup.WinnowMinShared]] cap-surviving fingerprints with the new
    * doc. Exactly the q213 pair rule evaluated over store ∪ batch and
    * restricted to (new × stored) pairs — candidates ONLY from the fp
    * equi-join, the df cap on the combined corpus, `nfp_new` the new
    * doc's surviving fingerprint count (the containment denominator a
    * dedup-on-ingest policy divides by). Batch-local doc_ids already
    * present in the store are excluded from `dup_of` (the
    * SignatureStore replay rule: a replayed batch probes a store that
    * already contains itself; verdicts must match the original run's).
    */
  def probe(s: SparkSession, t: Store, batch: DataFrame): DataFrame = {
    val bfp = Dedup.winnowFingerprints(batch)
    // Only fingerprints PRESENT IN THE BATCH can pair or contribute to
    // nfp_new, so the combined-corpus df is evaluated for exactly those:
    // store rows sharing a batch fp leave the bucketed scan through a
    // (broadcast) semi-join — the store is never shuffled, every
    // exchange below is batch-sized.
    val bCnt = bfp.groupBy(col("fp")).agg(count(lit(1)).as("nb"))
    val storeRows = s.table(t.fp)
      .join(bCnt.select(col("fp")), Seq("fp"), "left_semi")
      // replay exclusion (the SignatureStore rule): a replayed batch
      // probes a store already containing itself; dropping the store's
      // copies of batch doc_ids restores the original run's combined
      // corpus, so df and verdicts match the first delivery exactly
      .join(batch.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val sCnt = storeRows.groupBy(col("fp")).agg(count(lit(1)).as("ns"))
    val keep = bCnt.join(sCnt, Seq("fp"), "left")
      .filter(col("nb") + coalesce(col("ns"), lit(0L)) <= Dedup.WinnowDfCap)
      .select(col("fp"))
    val newCap = bfp.join(keep, Seq("fp"), "left_semi")
    val nfp = newCap.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp_new"))
    newCap
      .join(storeRows.join(keep, Seq("fp"), "left_semi")
        .select(col("doc_id").as("dup_of"), col("fp")), Seq("fp"))
      .groupBy(col("doc_id"), col("dup_of"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= Dedup.WinnowMinShared)
      .join(nfp, Seq("doc_id"))
      .select(col("doc_id"), col("dup_of"), col("shared"), col("nfp_new"))
  }
}
