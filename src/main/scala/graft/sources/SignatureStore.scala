package graft.sources

import graft.Tables
import graft.functions.PolyHash
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash signature/band store — the incremental near-dup
  * pattern for a 100 TB corpus.
  *
  * The batch LSH pipeline (q23/q33) recomputes signatures from raw text
  * every run: fine for a one-shot curation job, wasteful for a corpus
  * that grows continuously. The production middle step is a PERSISTED
  * store of what banding already computed:
  *
  *  - `sig(doc_id, H)` — each document's distinct shingle-hash set (the
  *    Jaccard-verify side), bucketed by `doc_id`;
  *  - `bands(doc_id, bk)` — one row per (document, band) with
  *    `bk = band_index * P + band_hash` (a single 8-byte join key),
  *    bucketed by `bk`.
  *
  * Because `bands` is bucketed by the probe key, probing a new
  * micro-batch shuffles ONLY the batch side (tiny, admission-bounded):
  * the store side of the band equi-join is exchange-free however large
  * the corpus — a near-dup arriving a day later is caught without
  * re-banding 100 TB. The store-to-store self-join (the full-corpus pair
  * scan, [[pairs]]) is exchange-free on BOTH sides for the same reason.
  *
  * All signature math is the ONE definition shared with the batch
  * pipeline ([[Dedup.minhashAgg]]/[[Dedup.bandHash]]) — a store row is
  * bit-identical to what q22/q23 compute from raw text, so store-derived
  * results stay oracle-checkable against DuckDB recomputing from text.
  */
object SignatureStore {

  private val P = PolyHash.P
  val Buckets = 16

  final case class Store(sig: String, bands: String)

  /** (sig rows, band rows) for a (doc_id, text) DataFrame — fully
    * map-side since r19 ([[Dedup.minhashSigs]]: shingle + signature
    * kernels in the scan projection, no aggregate exchange), exactly
    * the q22/q23 definition. Docs with zero shingles (< 3 words) drop
    * out: they cannot be shingle-near-dups (q23's convention).
    */
  def sigAndBands(docs: DataFrame): (DataFrame, DataFrame) = {
    val agg = Dedup.minhashSigs(docs, withSet = true)
    val sig = agg.select(col("doc_id"), col("H"))
    val bands = agg
      .select(col("doc_id"),
        posexplode(array((0 until Dedup.NumBands).map(Dedup.bandHash): _*)))
      .select(col("doc_id"),
        (col("pos").cast("long") * P + col("col")).as("bk"))
    (sig, bands)
  }

  /** Create (or overwrite) the store from a corpus. One-time layout cost,
    * like [[Bucketed]]'s CTAS.
    */
  def build(s: SparkSession, docs: DataFrame, tag: String): Store = {
    val t = Store(s"graft_sig_$tag", s"graft_band_$tag")
    Bucketed.dropStale(s, t.sig)
    Bucketed.dropStale(s, t.bands)
    val (sig, bands) = sigAndBands(docs)
    Bucketed.write(sig, t.sig, Buckets, "doc_id")
    Bucketed.write(bands, t.bands, Buckets, "bk")
    t
  }

  // store per sf directory, memoized like Bucketed.prepared
  private val prepared = scala.collection.concurrent.TrieMap.empty[String, Store]

  /** The store over `dir`'s documents table (built on first use). */
  def ensure(s: SparkSession, dir: String): Store =
    prepared.getOrElseUpdate(dir, {
      val tag = java.lang.Long.toHexString(PolyHash.hash(dir))
      build(s, Tables.load(s, dir, "documents").select("doc_id", "text"), tag)
    })

  /** Upsert: append a batch's signatures/bands with the SAME bucket
    * spec, so later probes stay exchange-free on the store side (each
    * bucket is a file set; appends add files per bucket, never reshuffle
    * existing ones).
    *
    * IDEMPOTENT per doc_id: a replayed micro-batch (foreachBatch is
    * at-least-once — a crash after this append re-delivers the batch)
    * re-offers doc_ids that are already stored; the anti-join against
    * the sig table (bucketed by doc_id — exchange-free on the store
    * side, only the tiny batch shuffles) drops them instead of silently
    * duplicating sig/band rows forever. Bands are written BEFORE sig:
    * a crash between the two writes then leaves at worst duplicate band
    * rows for one batch (harmless — candidates are DISTINCTed), never a
    * stored signature whose bands are missing (which would permanently
    * hide the doc from future probes).
    */
  def append(s: SparkSession, t: Store, docs: DataFrame): Unit = {
    val fresh = docs.join(s.table(t.sig).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    val (sig, bands) = sigAndBands(fresh)
    bands.write.bucketBy(Buckets, "bk").sortBy("bk")
      .mode("append").saveAsTable(t.bands)
    sig.write.bucketBy(Buckets, "doc_id").sortBy("doc_id")
      .mode("append").saveAsTable(t.sig)
  }

  /** Compact the store's tables ([[Bucketed.compact]]): per-batch
    * appends add one file set per bucket per batch (the streaming front
    * door appends every trigger); the rewrite merges them to one file
    * per bucket without changing rows, bucketing, or probe plans.
    */
  def compact(s: SparkSession, t: Store): Unit = {
    Bucketed.compact(s, t.sig, Buckets, "doc_id")
    Bucketed.compact(s, t.bands, Buckets, "bk")
  }

  /** Heal a compaction swap that crashed mid-rename ([[Bucketed.recover]])
    * — call when (re)opening a store handle; [[compact]] also self-heals
    * on entry, so an at-least-once replay of a compacting batch recovers
    * without intervention.
    */
  def recover(s: SparkSession, t: Store): Unit = {
    Bucketed.recover(s, t.sig)
    Bucketed.recover(s, t.bands)
  }

  /** Probe a (doc_id, text) micro-batch against the store: every
    * verified near-dup `(doc_id, dup_of, jaccard)` where `dup_of` is an
    * already-stored document. Candidates come ONLY from the band
    * equi-join on `bk` (never all-pairs); the store side needs no
    * shuffle (bucketed by `bk`), the batch side shuffles its few rows to
    * the store's bucketing.
    */
  def probe(s: SparkSession, t: Store, batch: DataFrame): DataFrame = {
    val (bSig, bBands) = sigAndBands(batch)
    val cand = bBands.alias("n")
      .join(s.table(t.bands).alias("o"),
        col("n.bk") === col("o.bk") && col("n.doc_id") =!= col("o.doc_id"))
      .select(col("n.doc_id").as("doc_id"), col("o.doc_id").as("dup_of"))
      .distinct()
      // a REPLAYED batch (at-least-once foreachBatch) probes a store
      // that already contains the batch itself; batch-local doc_ids are
      // not "previously stored", so they are excluded from dup_of —
      // replay verdicts match the original run's (in normal operation
      // this anti-join is a no-op: probe runs before append)
      .join(batch.select(col("doc_id").as("dup_of")), Seq("dup_of"), "left_anti")
    cand
      .join(bSig.select(col("doc_id"), col("H").as("H_new")), "doc_id")
      .join(s.table(t.sig).select(col("doc_id").as("dup_of"), col("H").as("H_old")),
        "dup_of")
      .select(col("doc_id"), col("dup_of"),
        Dedup.jaccard(col("H_new"), col("H_old")).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
  }

  /** Full-corpus verified near-dup pairs FROM THE STORE — the q23 result
    * without touching raw text: band self-join (exchange-free on both
    * sides: both are the same table bucketed by `bk`), distinct, then
    * Jaccard-verify through the `sig` table.
    */
  def pairs(s: SparkSession, t: Store): DataFrame = {
    val bands = s.table(t.bands)
    val cand = bands.alias("a")
      .join(bands.alias("c"),
        col("a.bk") === col("c.bk") && col("a.doc_id") < col("c.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("c.doc_id").as("doc_id_2"))
      .distinct()
    val sig = s.table(t.sig)
    cand
      .join(sig.select(col("doc_id").as("doc_id_1"), col("H").as("H1")), "doc_id_1")
      .join(sig.select(col("doc_id").as("doc_id_2"), col("H").as("H2")), "doc_id_2")
      .select(col("doc_id_1"), col("doc_id_2"),
        Dedup.jaccard(col("H1"), col("H2")).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
  }
}
