package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.PolyHash
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque BINARY columns with
  * typed metadata, decoded/feature-extracted in batched partition passes.
  *
  * The real decode (image/audio codec) is STUBBED — this container has no
  * media libraries — with a deterministic fake that derives metadata from
  * the bytes ([[StubDecoder.decode]]). Everything around the stub is the
  * real Spark shape: a typed `Dataset[MediaRow]`, `mapPartitions` so a
  * future native decoder amortizes per-batch init (codec contexts, model
  * weights) across a whole partition, and scalar metadata columns out.
  *
  * The media bytes here are the documents' UTF-8 text (the only corpus in
  * the testdata), which keeps the whole path oracle-checkable in SQL.
  */
object Multimodal {

  /** One media object: id + opaque payload. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Extracted metadata (what a decoder would surface). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, n_frames: Long)

  object StubDecoder {
    /** STUB: a real implementation would decode the container/codec here
      * (e.g. JPEG dimensions, audio duration). The fake derives
      * deterministic pseudo-dimensions from a content hash so the pipeline
      * is exercised end-to-end and SQL-oracle-checkable.
      */
    def decode(m: MediaRow): MediaMeta = {
      val h = PolyHash.hash(new String(m.media, java.nio.charset.StandardCharsets.UTF_8))
      MediaMeta(
        doc_id = m.doc_id,
        n_bytes = m.media.length.toLong,
        width = h % 1920L,
        height = h % 1080L,
        n_frames = m.media.length.toLong / 100L + 1L)
    }
  }

  /** The partition-batched decode pass: one decoder instantiation per
    * partition (the `it =>` closure is where codec init would live).
    */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init of the (stub) decoder happens here
      it.map(StubDecoder.decode)
    }
  }

  val qMultimodal: QuerySpec = QuerySpec(
    "q32_multimodal",
    (s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[MediaRow]
      decodeAll(media).toDF()
    },
    Some(s"""SELECT doc_id,
            | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
            | ${PolyHash.oracleSql("text")} % 1920 AS width,
            | ${PolyHash.oracleSql("text")} % 1080 AS height,
            | CAST(octet_length(encode(text)) AS BIGINT) // 100 + 1 AS n_frames
            | FROM documents""".stripMargin.replaceAll("\n", "")))

  val specs: Seq[QuerySpec] = Seq(qMultimodal)
}
