package graft.sources

import graft.Tables
import graft.functions.PolyHash
import graft.operators.{Dedup, Scratch}
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
  * Two tables (the IndexStore postings+manifest discipline):
  *  - `fp(doc_id, fp)` — each document's winnowing-selected
  *    fingerprints ([[Dedup.winnowFingerprints]], the ONE selection
  *    definition shared with the gated query), bucketed by `fp`, the
  *    probe key: probing a micro-batch shuffles ONLY the batch side,
  *    and the df-cap aggregate and store-to-store self-join are
  *    exchange-free however large the corpus.
  *  - `docs(doc_id)` — the ingested-document manifest, bucketed by
  *    `doc_id`, the idempotency key: [[append]]'s replay guard
  *    anti-joins the batch against THIS table (batch-sized exchange on
  *    the batch side only). Before the manifest, the guard ran
  *    `distinct(doc_id)` over the fp-bucketed table — a full-corpus
  *    SHUFFLE per trigger, the exact scale bug the fp bucketing exists
  *    to avoid (measured: the r15 `winnow_ingest` leg at 22.7 docs/s
  *    vs ~60 for the other ingest legs).
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

  final case class Store(fp: String, docs: String)

  /** Create (or overwrite) the store from a (doc_id, text) corpus. */
  def build(s: SparkSession, docs: DataFrame, tag: String): Store = {
    val t = Store(s"graft_winnow_$tag", s"graft_winnowdocs_$tag")
    Bucketed.dropStale(s, t.fp)
    Bucketed.dropStale(s, t.docs)
    Bucketed.write(Dedup.winnowFingerprints(docs), t.fp, Buckets, "fp")
    Bucketed.write(docs.select(col("doc_id")), t.docs, Buckets, "doc_id")
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
    * micro-batch's doc_ids anti-join against the MANIFEST (doc_id-
    * bucketed: store side exchange-free, batch side batch-sized) and
    * fold nothing twice.
    *
    * Crash window (the IndexStore/SpanStream precedent): fp rows append
    * BEFORE the docs manifest, so a crash between the two writes
    * followed by checkpoint replay re-appends the batch's (doc_id, fp)
    * rows EXACTLY (winnowFingerprints is distinct per (doc_id, fp), so
    * the replay duplicates rows bit-for-bit); [[compact]]'s
    * compactDistinct rewrite heals them, and the order can never drop a
    * document (manifest-first would silently lose fingerprints — the
    * worse failure). Until compaction runs, duplicated fp rows double
    * that batch's contribution to `ns`/`shared` in [[probe]] — the same
    * pre-heal skew IndexStore documents for tf.
    */
  def append(s: SparkSession, t: Store, docs: DataFrame): Unit = {
    val fresh = docs.join(s.table(t.docs), Seq("doc_id"), "left_anti")
      .persist()
    try {
      Dedup.winnowFingerprints(fresh)
        .write.bucketBy(Buckets, "fp").sortBy("fp")
        .mode("append").saveAsTable(t.fp)
      fresh.select(col("doc_id"))
        .write.bucketBy(Buckets, "doc_id").sortBy("doc_id")
        .mode("append").saveAsTable(t.docs)
      s.catalog.refreshTable(t.fp)
      s.catalog.refreshTable(t.docs)
    } finally fresh.unpersist(): Unit
  }

  /** Compact per-batch append files to one file set per bucket. The fp
    * table goes through [[Bucketed.compactDistinct]]: rows are distinct
    * per (doc_id, fp) by construction ([[Dedup.winnowFingerprints]]'s
    * `.distinct()`), so the rewrite's dedupe is a no-op in normal
    * operation and heals exactly the [[append]] crash-window replays.
    */
  def compact(s: SparkSession, t: Store): Unit = {
    Bucketed.compactDistinct(s, t.fp, Buckets, "fp")
    Bucketed.compactDistinct(s, t.docs, Buckets, "doc_id")
  }

  /** Heal a compaction swap that crashed mid-rename. */
  def recover(s: SparkSession, t: Store): Unit = {
    Bucketed.recover(s, t.fp)
    Bucketed.recover(s, t.docs)
  }

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
    *
    * Both probe inputs are flushed ONCE (batch-sized scratch — the
    * q213 flush discipline): the batch's window pass would otherwise
    * re-run per consumer (it feeds the df count, the pair join and the
    * nfp denominator) and the pruned store scan feeds two consumers.
    * The flush also makes every downstream join's build side a known
    * tiny parquet, so the store-side bucketed scan is never shuffled.
    */
  /** The pruned store-side scan [[probe]] flushes: store rows sharing a
    * batch fingerprint, minus the store's copies of batch doc_ids. Kept
    * as a lazy plan so WinnowStoreSpec can pin its shape (store scan
    * leaves through broadcast semi/anti joins — never shuffled).
    */
  private[graft] def storeRowsPlan(s: SparkSession, t: Store,
      batchFps: DataFrame, batch: DataFrame): DataFrame =
    s.table(t.fp)
      .join(broadcast(batchFps.select(col("fp")).distinct()), Seq("fp"),
        "left_semi")
      // replay exclusion (the SignatureStore rule): a replayed batch
      // probes a store already containing itself; dropping the store's
      // copies of batch doc_ids restores the original run's combined
      // corpus, so df and verdicts match the first delivery exactly
      .join(broadcast(batch.select(col("doc_id"))), Seq("doc_id"),
        "left_anti")

  // Per-store probe sequence: Scratch.flush deletes a tag's PREVIOUS
  // directory on entry, so a fixed per-store tag lets two concurrent
  // probes of one store (a second WinnowStream, an ad-hoc probe beside
  // the stream) delete each other's flush while the earlier probe's
  // lazy frame may still read it. A rotating 4-slot discriminator keeps
  // each probe's flush alive across the next THREE probes of the same
  // store (growth stays bounded at 4 slots × 2 tags per store); callers
  // must consume a probe frame before 4 further probes of that store —
  // WinnowStream collects within its own trigger, far inside the bound.
  private val probeSeq = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicLong]

  def probe(s: SparkSession, t: Store, batch: DataFrame): DataFrame = {
    val slot = probeSeq
      .getOrElseUpdate(t.fp, new java.util.concurrent.atomic.AtomicLong)
      .getAndIncrement() % 4
    val bfp = Scratch.flush(s, s"winnowprobe-b-$slot-${t.fp}",
      Dedup.winnowFingerprints(batch))
    val bCnt = bfp.groupBy(col("fp")).agg(count(lit(1)).as("nb"))
    // Only fingerprints PRESENT IN THE BATCH can pair or contribute to
    // nfp_new, so the combined-corpus df is evaluated for exactly those:
    // store rows sharing a batch fp leave the bucketed scan through a
    // (broadcast) semi-join — the store is never shuffled, every
    // exchange below is batch-sized.
    val storeRows = Scratch.flush(s, s"winnowprobe-s-$slot-${t.fp}",
      storeRowsPlan(s, t, bfp, batch))
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
