package graft.sources

import graft.Tables
import graft.functions.PolyHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index — the lexical-retrieval twin of the dense
  * stack's clustered/PQ layouts ([[graft.streaming.AnnStream]] /
  * [[graft.streaming.PqStream]] keep those current; this is the store
  * the BM25 side serves from).
  *
  * The batch q93 plan recomputes per-doc term frequencies from raw text
  * per query batch: fine for one report, wasteful for a serving stack.
  * The production middle step is the classic posting-list layout:
  *
  *  - `postings(tok, doc_id, tf, dl)` — one row per (token, document)
  *    with the exact whole-token occurrence count and the document's
  *    token length denormalized in, BUCKETED BY `tok`: a literal term
  *    probe (`tok IN (...)`) prunes to the matching buckets and the
  *    per-term rows, never a corpus scan;
  *  - `manifest(doc_id, dl)` — one row per indexed document, bucketed
  *    by `doc_id`: the corpus stats side (N, total tokens D) and the
  *    idempotent-append guard (the [[SignatureStore]] discipline).
  *
  * tf/dl from explode + hash-agg are bit-identical to q93's
  * bracketed-replace counts (both count exact whole-token occurrences),
  * so store-served scores stay oracle-checkable against DuckDB
  * recomputing from raw text — the store round-trip proof is
  * q154 passing q93's UNCHANGED oracle.
  */
object IndexStore {

  val Buckets = 16

  final case class Store(postings: String, manifest: String)

  /** (postings rows, manifest rows) for a (doc_id, text) frame: one
    * token explosion + two map-side-combinable aggs.
    */
  def postingsOf(docs: DataFrame): (DataFrame, DataFrame) = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val man = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val post = tf.join(man, Seq("doc_id"))
      .select(col("tok"), col("doc_id"), col("tf"), col("dl"))
    (post, man)
  }

  /** Create (or overwrite) the store from a corpus — one-time layout
    * cost, like [[Bucketed]]'s CTAS.
    */
  def build(s: SparkSession, docs: DataFrame, tag: String): Store = {
    val t = Store(s"graft_post_$tag", s"graft_docman_$tag")
    Bucketed.dropStale(s, t.postings)
    Bucketed.dropStale(s, t.manifest)
    val (post, man) = postingsOf(docs)
    Bucketed.write(post, t.postings, Buckets, "tok")
    Bucketed.write(man, t.manifest, Buckets, "doc_id")
    t
  }

  // store per sf directory, memoized like SignatureStore.prepared;
  // builds serialized (the DupGraph/SpanStore racing-thunk lesson)
  private val prepared = scala.collection.concurrent.TrieMap.empty[String, Store]
  private val buildLock = new Object

  /** The store over `dir`'s documents table (built on first use). */
  def ensure(s: SparkSession, dir: String): Store = buildLock.synchronized {
    prepared.getOrElseUpdate(dir, {
      val tag = java.lang.Long.toHexString(PolyHash.hash(dir))
      build(s, Tables.load(s, dir, "documents").select("doc_id", "text"), tag)
    })
  }

  /** Idempotent upsert: index the batch's documents not already in the
    * manifest (anti-join on `doc_id` — the store side is bucketed, so
    * only the tiny batch shuffles), appending postings and manifest.
    * Replay-safe: a re-delivered batch's docs are manifested and drop
    * out. Refreshes the caller's relation caches (the micro-batch
    * session-clone rule).
    *
    * Crash window (the SpanStream precedent): postings append BEFORE
    * manifest append, so a crash between them re-indexes the batch on
    * replay and duplicates its postings rows EXACTLY (same (tok,
    * doc_id, tf, dl)); the periodic [[Bucketed.compactDistinct]] in
    * [[graft.streaming.IndexStream]]'s hook heals them, and they can
    * never drop a document (the manifest-first order would lose
    * postings silently instead — the worse failure).
    */
  def append(s: SparkSession, t: Store, docs: DataFrame): Unit = {
    val fresh = docs
      .join(s.table(t.manifest).select(col("doc_id")), Seq("doc_id"),
        "left_anti")
    val (post, man) = postingsOf(fresh)
    post.write.bucketBy(Buckets, "tok").sortBy("tok")
      .mode("append").saveAsTable(t.postings)
    man.write.bucketBy(Buckets, "doc_id").sortBy("doc_id")
      .mode("append").saveAsTable(t.manifest)
    s.catalog.refreshTable(t.postings)
    s.catalog.refreshTable(t.manifest)
  }
}
