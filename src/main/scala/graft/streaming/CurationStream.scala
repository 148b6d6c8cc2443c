package graft.streaming

import graft.TextMetrics
import graft.functions.PolyHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of the batch curation pipeline
  * ([[graft.operators.Curation]]): documents arrive continuously, and
  * each micro-batch is exact-deduped (against everything seen within the
  * watermark horizon), quality-filtered, and annotated with token counts
  * — the continuous-ingest front door of a training-data pipeline.
  *
  * Scale shape: dedup state is keyed by the 8-byte content hash (not the
  * text) and bounded by the watermark horizon; the quality filter and
  * token count are stateless map-side projections. Near-dup (MinHash-LSH)
  * stays a batch job over the deduped store — banding needs a global view
  * that a per-trigger stream cannot have; the stream's job is to keep the
  * store exact-duplicate-free and quality-bounded on the way in.
  */
object CurationStream {

  /** @param docs streaming DataFrame with (doc_id, ts, text, n_chars) */
  def curate(docs: DataFrame, watermarkDelay: String = "1 hour",
      minChars: Int = 50, maxChars: Int = 10000,
      maxStopRatio: Double = 0.5): DataFrame = {
    // quality metrics come from the ONE shared definition (TextMetrics) so
    // the streaming gate can never silently fork from the batch gate; a
    // zero-word doc gets a NULL ratio and is dropped deterministically
    val words = TextMetrics.wordCount(col("text"))
    val stops = TextMetrics.stopCount(col("text"))
    docs
      .withColumn("text_hash", PolyHash(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")
      .withColumn("n_words", words.cast("long"))
      .withColumn("stop_ratio", TextMetrics.stopRatio(words, stops))
      .filter(col("n_chars") >= minChars && col("n_chars") <= maxChars
        && col("stop_ratio") < maxStopRatio)
      .select(col("doc_id"), col("text_hash"), col("n_words"), col("stop_ratio"))
  }
}
