package graft.sources

import org.apache.spark.sql.SparkSession

/** Compliance delete (right-to-be-forgotten) across the persisted
  * serving layouts — the operator a 100 TB deployment is legally
  * required to have: when documents (or the vectors derived from them)
  * must be erased, every derived store has to drop BOTH the rows that
  * would serve them and the content-bearing state (shingle-hash sets,
  * postings, quantized vectors) computed from them.
  *
  * All five layouts store strictly PER-DOCUMENT rows (a deliberate
  * design property: no store folds multiple documents into one
  * irreversible aggregate), so a purge is a row-local anti-join rewrite
  * — [[Bucketed.purgeBucketed]] / [[Bucketed.purgePartitioned]], the
  * same crash-safe twin + rename-swap machinery as compaction — and a
  * purged store is BIT-IDENTICAL to one rebuilt from the remaining
  * corpus (under the same frozen codebooks, for the vector layouts).
  * `ForgetSpec` pins that equivalence per store, which is the strongest
  * possible erasure proof: nothing derived from the purged documents
  * remains, because the purged store is indistinguishable from one that
  * never saw them.
  *
  * Serving-stat correctness falls out of the same property: BM25's
  * N / total-length / df are computed AT SERVE TIME from the manifest
  * and postings ([[IndexStore]]), so deletes shift the corpus statistics
  * exactly as a rebuild would — no stale-df window.
  *
  * Ordering within a store puts the DISCOVERY side first (bands /
  * postings — after it, the doc can no longer be surfaced) and the
  * content/guard side second (sig / manifest); a crash between the two
  * leaves a transiently half-purged store that an idempotent re-run
  * completes. The 100 TB cadence is batched: queue delete requests,
  * apply per hour/day alongside compaction (each purge IS a
  * compaction); for corpus-scale erasure, rebuild the store instead.
  *
  * The streaming span stores (SpanStream / CleanStream position tables)
  * purge with the identical [[Bucketed.purgeBucketed]] call on their
  * doc-keyed tables — same row-local layout discipline.
  */
object Forget {

  /** Erase `docIds` from a MinHash signature/band store: bands first
    * (the doc stops being a candidate), then its shingle-hash sets.
    */
  def signatures(s: SparkSession, t: SignatureStore.Store,
      docIds: Seq[Long]): Unit = {
    Bucketed.purgeBucketed(s, t.bands, SignatureStore.Buckets, "bk", Nil,
      "doc_id", docIds)
    Bucketed.purgeBucketed(s, t.sig, SignatureStore.Buckets, "doc_id", Nil,
      "doc_id", docIds)
  }

  /** Erase `docIds` from an inverted index: postings first (the doc
    * stops being served), then the manifest rows — N and D are manifest
    * aggregates, so the corpus stats shift exactly as a rebuild would.
    */
  def index(s: SparkSession, t: IndexStore.Store, docIds: Seq[Long]): Unit = {
    Bucketed.purgeBucketed(s, t.postings, IndexStore.Buckets, "tok", Nil,
      "doc_id", docIds)
    Bucketed.purgeBucketed(s, t.manifest, IndexStore.Buckets, "doc_id", Nil,
      "doc_id", docIds)
    s.catalog.refreshTable(t.postings)
    s.catalog.refreshTable(t.manifest)
  }

  /** Erase `vecIds` from a banded sign-LSH embedding index
    * ([[EmbeddingIndex]] layout: bucketed by (band, bh), rows carry the
    * quantized vector).
    */
  def embeddingIndex(s: SparkSession, table: String,
      vecIds: Seq[Long]): Unit =
    Bucketed.purgeBucketed(s, table, EmbeddingIndex.Buckets, "band",
      Seq("bh"), "vec_id", vecIds)

  /** Erase `vecIds` from a cid-partitioned full-vector clustered layout
    * ([[graft.operators.Similarity.ensureClustered]]).
    */
  def clustered(s: SparkSession, table: String, vecIds: Seq[Long]): Unit =
    Bucketed.purgePartitioned(s, table, "cid", "vec_id", vecIds)

  /** Erase `vecIds` from a cid-partitioned PQ codes table
    * ([[graft.operators.ProductQuant]]).
    */
  def codes(s: SparkSession, table: String, vecIds: Seq[Long]): Unit =
    Bucketed.purgePartitioned(s, table, "cid", "vec_id", vecIds)
}
