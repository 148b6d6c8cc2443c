package graft.streaming

import graft.sources.EmbeddingIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous-ingest front door for the persisted embedding index — the
  * embedding twin of [[CurationStream.startIncremental]]'s SignatureStore
  * upsert: embeddings arrive as a stream, and each micro-batch is (1)
  * PROBED against the index — verified near-dups of any previously
  * indexed vector are reported, however long ago the twin arrived — and
  * (2) UPSERTED, so later batches probe against it. Nothing ever
  * re-bands the corpus: the probe shuffles only the admission-bounded
  * batch side (the index is bucketed by the band key), the upsert is a
  * map-side quantize/band pass plus a bucketed append.
  *
  * Unlike the text front door (curation FILTERS its corpus), the index
  * front door keeps every vector: an ANN / near-dup index must cover
  * flagged vectors too, so the incrementally-built index is
  * bit-identical to a batch [[EmbeddingIndex.build]] over the same
  * vectors — q52's from-index pairs (oracled against q25's from-raw SQL)
  * are the equivalence check.
  *
  * Failure/replay contract: foreachBatch is at-least-once, so a crash
  * after the append re-delivers the batch. The INDEX stays exact:
  * [[EmbeddingIndex.appendFresh]] is idempotent per vec_id and
  * [[EmbeddingIndex.probe]] excludes the batch's own vec_ids from
  * `dup_of`, so a replay produces the original verdicts and appends
  * nothing twice. A compaction crash self-heals on the replayed
  * compact ([[graft.sources.Bucketed.recover]]).
  *
  * @param emb streaming DataFrame with (vec_id, embedding)
  * @param onFlagged receives each batch's near-dup verdicts
  *                  (vec_id, dup_of, cos_sim)
  * @param compactEvery run [[EmbeddingIndex.compact]] after every Nth
  *                  batch (0 = never): per-trigger appends add one file
  *                  set per bucket per batch, and periodic compaction
  *                  keeps probe reads from degrading over a
  *                  long-running ingest
  */
object EmbeddingStream {

  def startIncremental(spark: SparkSession, emb: DataFrame, table: String,
      checkpointDir: String,
      onFlagged: DataFrame => Unit = _ => (),
      compactEvery: Int = 0): StreamingQuery = {
    // heal a compaction swap a PREVIOUS run crashed mid-rename before the
    // first batch probes the index — the replayed-compact self-heal only
    // fires on compaction batches, but batch 0 probes immediately
    EmbeddingIndex.recover(spark, table)
    emb
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.select(col("vec_id"), col("embedding")).persist()
        try {
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            EmbeddingIndex.compact(spark, table)
          if (b.limit(1).count() > 0) {
            val verdicts = EmbeddingIndex.probe(spark, table, b).persist()
            // probe-then-append order guarantees a batch's vectors are
            // visible to the NEXT batch but never to their own probe
            try {
              onFlagged(verdicts)
              EmbeddingIndex.appendFresh(spark, table, b)
            } finally verdicts.unpersist()
          }
        } finally b.unpersist()
      }
      .start()
  }
}
