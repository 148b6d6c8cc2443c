package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.PolyHash
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque BINARY columns with
  * typed metadata, decoded/feature-extracted in batched partition passes.
  *
  * For the GATED queries the decode is a deterministic fake that derives
  * metadata from the bytes ([[StubDecoder.decode]]) — the testdata corpus
  * is text, and the stub keeps the gate SQL-oracle-checkable. A REAL
  * pure-JVM codec exists behind the same seam ([[PpmDecoder]] /
  * [[PpmEncoder]]: binary PPM parsing, per-frame pixel fingerprints,
  * chunk-mean features), proving the contract carries an actual decoder;
  * heavier codecs (JPEG, audio) are the same injection, with native libs.
  * Everything around the decoder is the real Spark shape: a typed
  * `Dataset[MediaRow]`, `mapPartitions` so a decoder amortizes per-batch
  * init (codec contexts, model weights) across a whole partition, and
  * scalar metadata columns out.
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

  /** The decode contract a real deployment injects: [[open]] runs once
    * per partition (codec contexts, native libs, model weights), then
    * [[decode]]/[[frameHash]] per row. Swapping in a real codec is a
    * constructor argument, not an edit to the pipeline.
    */
  trait MediaDecoder extends Serializable {
    /** Once-per-partition init hook (codec/context/model setup). */
    def open(): Unit = ()
    def decode(m: MediaRow): MediaMeta
    /** Fingerprint of frame `frameIdx` (a real implementation hashes the
      * decoded frame's pixels; the stub hashes the payload + index).
      */
    def frameHash(m: MediaRow, frameIdx: Long): Long
  }

  object StubDecoder extends MediaDecoder {
    /** STUB: a real implementation would decode the container/codec here
      * (e.g. JPEG dimensions, audio duration). The fake derives
      * deterministic pseudo-dimensions from a content hash so the pipeline
      * is exercised end-to-end and SQL-oracle-checkable.
      */
    override def decode(m: MediaRow): MediaMeta = {
      val h = PolyHash.hash(new String(m.media, java.nio.charset.StandardCharsets.UTF_8))
      MediaMeta(
        doc_id = m.doc_id,
        n_bytes = m.media.length.toLong,
        width = h % 1920L,
        height = h % 1080L,
        n_frames = m.media.length.toLong / 100L + 1L)
    }

    override def frameHash(m: MediaRow, frameIdx: Long): Long = {
      val h = PolyHash.hash(new String(m.media, java.nio.charset.StandardCharsets.UTF_8))
      (h * 31L + frameIdx) % PolyHash.P
    }
  }

  /** The partition-batched decode pass: one decoder init per partition. */
  def decodeAll(media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      decoder.open() // per-partition codec/model init
      it.map(decoder.decode)
    }
  }

  /** One sampled frame after resize: the one→many batch shape of video
    * feature extraction (decode once per doc, emit a bounded frame set).
    */
  final case class FrameRow(
      doc_id: Long, frame_idx: Long, out_w: Long, out_h: Long, frame_hash: Long)

  /** Fit (w, h) into a box preserving aspect ratio — the integer/double
    * arithmetic a real scaler performs, deterministic and SQL-checkable.
    * A nonzero dimension clamps to ≥ 1 after scaling: flooring an
    * extreme-aspect input (998×1 into 320×240) to height 0 would turn a
    * real image into a degenerate one and break idempotency — found by
    * the `resizeFit` ScalaCheck law.
    */
  def resizeFit(w: Long, h: Long, maxW: Long, maxH: Long): (Long, Long) =
    if (w == 0 || h == 0) (0L, 0L)
    else if (w <= maxW && h <= maxH) (w, h)
    else {
      val scale = math.min(maxW.toDouble / w, maxH.toDouble / h)
      (math.max(1L, math.floor(w * scale).toLong),
        math.max(1L, math.floor(h * scale).toLong))
    }

  /** Decode + strided frame sampling + resize + per-frame fingerprint in
    * ONE partition pass (a real video pipeline decodes once and samples
    * inline — never "decode all frames, then filter"). Output is bounded:
    * ≤ maxFrames rows per doc regardless of media length, so the explode
    * can never amplify a 100 TB corpus unboundedly.
    */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int,
      decoder: MediaDecoder = StubDecoder): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      decoder.open() // per-partition codec/model init
      it.flatMap { m =>
        val meta = decoder.decode(m)
        val stride = (meta.n_frames + maxFrames - 1) / maxFrames // ceil → ≤ maxFrames rows
        val (ow, oh) = resizeFit(meta.width, meta.height, 320L, 240L)
        (0L until meta.n_frames by stride).iterator.map { i =>
          FrameRow(m.doc_id, i, ow, oh, decoder.frameHash(m, i))
        }
      }
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

  /** One extracted feature vector, fixed-point (the engine's similarity
    * operators run on quantized integer vectors anyway — see
    * [[graft.functions.VectorOps]] — so the extractor emits that domain
    * directly).
    */
  final case class MediaFeatures(doc_id: Long, qfeat: Array[Long])

  /** The feature-encoder contract (a real one runs a vision/audio model
    * initialized once per partition in [[open]]); output is fixed-point,
    * directly consumable by the ANN operators.
    */
  trait MediaEncoder extends Serializable {
    def open(): Unit = ()
    def extract(m: MediaRow, dim: Int): MediaFeatures
  }

  /** STUB encoder: deterministic `dim` fixed-point features derived from
    * the content hash, so the full pipeline stays SQL-oracle-checkable.
    */
  object StubEncoder extends MediaEncoder {
    override def extract(m: MediaRow, dim: Int): MediaFeatures = {
      val h = PolyHash.hash(new String(m.media, java.nio.charset.StandardCharsets.UTF_8))
      MediaFeatures(m.doc_id,
        Array.tabulate(dim)(j => (h * 31L + j) % PolyHash.P - (PolyHash.P / 2)))
    }
  }

  def extractFeatures(media: Dataset[MediaRow], dim: Int,
      encoder: MediaEncoder = StubEncoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      encoder.open() // per-partition model init
      it.map(m => encoder.extract(m, dim))
    }
  }

  /** Q41 — feature extraction, exploded to scalar rows (like q22) so the
    * oracle compare never depends on array encodings.
    */
  val qFeatures: QuerySpec = QuerySpec(
    "q41_media_features",
    (s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[MediaRow]
      extractFeatures(media, dim = 8).toDF()
        .select(col("doc_id"), posexplode(col("qfeat")))
        .select(col("doc_id"), col("pos").cast("long").as("j"), col("col").as("qf"))
    },
    Some(s"""SELECT doc_id, t.j AS j,
            | (${PolyHash.oracleSql("text")} * 31 + t.j) % ${PolyHash.P}
            |   - ${PolyHash.P / 2} AS qf
            | FROM documents, range(0, 8) t(j)""".stripMargin.replaceAll("\n", "")))

  /** Q36 — the full multimodal extract pipeline: decode → strided frame
    * sample (≤ 8 frames/doc) → aspect-fit resize to 320×240 → per-frame
    * fingerprint.
    */
  val qFrames: QuerySpec = QuerySpec(
    "q36_frames",
    (s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[MediaRow]
      sampleFrames(media, maxFrames = 8).toDF()
    },
    Some {
      val h = PolyHash.oracleSql("text")
      s"""WITH meta AS (SELECT doc_id, $h AS h,
         |   $h % 1920 AS w, $h % 1080 AS ht,
         |   CAST(octet_length(encode(text)) AS BIGINT) // 100 + 1 AS nf
         |  FROM documents),
         | rs AS (SELECT *, CASE
         |    WHEN w = 0 OR ht = 0 THEN 0
         |    WHEN w <= 320 AND ht <= 240 THEN w
         |    ELSE greatest(1, CAST(floor(w * least(320.0 / w, 240.0 / ht)) AS BIGINT)) END AS out_w,
         |   CASE
         |    WHEN w = 0 OR ht = 0 THEN 0
         |    WHEN w <= 320 AND ht <= 240 THEN ht
         |    ELSE greatest(1, CAST(floor(ht * least(320.0 / w, 240.0 / ht)) AS BIGINT)) END AS out_h
         |  FROM meta)
         | SELECT doc_id, unnest(range(0, nf, (nf + 7) // 8)) AS frame_idx,
         |  out_w, out_h, (h * 31 + unnest(range(0, nf, (nf + 7) // 8)))
         |    % ${PolyHash.P} AS frame_hash
         | FROM rs""".stripMargin.replaceAll("\n", "")
    })

  /** q71 — the REAL codec, gated: per-document synthetic "videos" (two
    * concatenated binary-P6 frames whose pixel bytes derive from
    * (doc_id, frame, position)) round-trip through [[PpmEncoder]]-style
    * serialization and the REAL [[PpmDecoder]] — actual header parsing,
    * frame splitting, and pixel fingerprints, not the stub. The oracle
    * recomputes each fingerprint from the generation formula (the same
    * value by construction instead of by decoding), so the gate holds
    * iff the encode→decode→hash path preserves every pixel byte: any
    * header mis-parse, frame mis-split, or signed-byte slip shifts the
    * hash. q32/q36/q41 keep gating the stub-backed PLUMBING; this gates
    * the CODEC.
    *
    * Same scale shape as the other multimodal passes: one
    * `mapPartitions` (the codec seam — per-partition decoder init),
    * map-only, no shuffle.
    */
  val qPpmDecode: QuerySpec = QuerySpec(
    "q71_ppm_decode",
    (s, dir) => {
      import s.implicits._
      val (w, h, nFrames) = (4, 4, 2)
      Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          PpmDecoder.open()
          it.flatMap { id =>
            val payload = Array.concat((0 until nFrames).map { f =>
              Ppm.encodeFrame(w, h, Array.tabulate(w * h * 3)(k =>
                ((id * 31 + f * 17 + k) % 256).toByte))
            }: _*)
            val m = MediaRow(id, payload)
            val meta = PpmDecoder.decode(m)
            (0L until meta.n_frames).map(f =>
              (id, f, meta.width, meta.height, PpmDecoder.frameHash(m, f)))
          }
        }
        .toDF("doc_id", "frame_idx", "width", "height", "frame_fp")
    },
    Some(s"""SELECT doc_id, f AS frame_idx,
            |  CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
            |  list_reduce(
            |    list_transform(range(0, 48), k -> (doc_id * 31 + f * 17 + k) % 256),
            |    (x, y) -> (x * 31 + y) % ${PolyHash.P}) AS frame_fp
            | FROM documents, range(0, 2) t(f)""".stripMargin
      .replaceAll("\n", "")))

  val specs: Seq[QuerySpec] = Seq(qMultimodal, qFrames, qFeatures, qPpmDecode)
}
