package graft.streaming

import graft.sources.{Bucketed, IndexStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest for the inverted index ([[IndexStore]]): documents
  * arrive continuously and each micro-batch's novel docs are tokenized
  * and appended to the posting-list layout — the lexical serving stack's
  * incremental path, completing the front-door family (signatures,
  * sign-LSH, PQ codes, clustered vectors, spans, chunks, graph labels,
  * drift histograms, and now postings).
  *
  * Scale shape: the per-batch tokenize + tf agg is map-side over the
  * admission-bounded batch; the manifest anti-join shuffles only the
  * batch side (the store is doc_id-bucketed); the postings append lands
  * in tok-buckets so the q154 serving probe stays pruned however long
  * the ingest runs.
  *
  * Failure/replay contract: foreachBatch is at-least-once; the manifest
  * doc_id anti-join makes re-delivered docs append nothing. The
  * postings-before-manifest crash window duplicates postings rows
  * EXACTLY (never drops a doc); the periodic [[Bucketed.compactDistinct]]
  * in the compaction hook heals them (the SpanStream discipline —
  * documented at [[IndexStore.append]]).
  */
object IndexStream {

  /** @param compactEvery run [[Bucketed.compactDistinct]] on the
    *   postings (and [[Bucketed.compact]] on the manifest) after every
    *   Nth batch (0 = never): bounds per-trigger file growth AND heals
    *   any crash-window duplicate postings rows
    */
  def startIncremental(spark: SparkSession, docs: DataFrame,
      store: IndexStore.Store, checkpointDir: String,
      compactEvery: Int = 0): StreamingQuery = {
    Bucketed.recover(spark, store.postings)
    Bucketed.recover(spark, store.manifest)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          Bucketed.compactDistinct(spark, store.postings,
            IndexStore.Buckets, "tok")
          Bucketed.compact(spark, store.manifest,
            IndexStore.Buckets, "doc_id")
        }
        if (batch.limit(1).count() > 0)
          IndexStore.append(spark, store, batch)
      }
      .start()
  }
}
