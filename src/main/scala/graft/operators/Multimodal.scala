package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque BINARY columns with
  * typed metadata, decoded/feature-extracted in batched partition passes.
  *
  * The GATED queries run the REAL pure-JVM codec ([[PpmDecoder]] /
  * [[PpmEncoder]]: binary PPM header parsing, frame splitting, per-frame
  * pixel fingerprints, chunk-mean features) over deterministic synthetic
  * "videos" ([[Ppm.syntheticVideo]]) — the testdata corpus is text, so
  * the media BYTES are generated from `doc_id` by a closed-form pixel
  * formula, which keeps every decoded value SQL-oracle-checkable: the
  * oracle recomputes metadata and fingerprints from the generation
  * formula, so the gate holds iff encode → decode → sample → resize →
  * fingerprint preserves every pixel byte. Heavier codecs (JPEG, audio)
  * are the same injection seam, with native libs.
  *
  * Everything around the decoder is the real Spark shape: a typed
  * `Dataset[MediaRow]`, `mapPartitions` so a decoder amortizes per-batch
  * init (codec contexts, model weights) across a whole partition, and
  * scalar metadata columns out. Map-only, no shuffle — the 100 TB cost
  * is per-row JVM decode, embarrassingly parallel.
  */
object Multimodal {

  /** One media object: id + opaque payload. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Extracted metadata (what a decoder would surface). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, n_frames: Long)

  /** The decode contract a real deployment injects: [[open]] runs once
    * per partition (codec contexts, native libs, model weights), then
    * [[decode]]/[[frameHashes]] per row. Swapping in another codec is a
    * constructor argument, not an edit to the pipeline.
    */
  trait MediaDecoder extends Serializable {
    /** Once-per-partition init hook (codec/context/model setup). */
    def open(): Unit = ()
    def decode(m: MediaRow): MediaMeta
    /** Fingerprint of frame `frameIdx` (a real implementation hashes the
      * decoded frame's pixels).
      */
    def frameHash(m: MediaRow, frameIdx: Long): Long
    /** Fingerprints for a batch of frames of ONE document. Override when
      * per-frame access re-does per-document work (container parsing):
      * the default delegates per index, which is fine only when
      * [[frameHash]] is O(1) per call.
      */
    def frameHashes(m: MediaRow, frameIdxs: Seq[Long]): Seq[Long] =
      frameIdxs.map(frameHash(m, _))
  }

  /** The partition-batched decode pass: one decoder init per partition. */
  def decodeAll(media: Dataset[MediaRow],
      decoder: MediaDecoder): Dataset[MediaMeta] = {
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
    * can never amplify a 100 TB corpus unboundedly. Frame fingerprints go
    * through the decoder's BATCHED [[MediaDecoder.frameHashes]] so a
    * container-parsing codec stays linear in frame count (a per-frame
    * `frameHash` loop would re-parse the payload per sampled frame).
    */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int,
      decoder: MediaDecoder, maxW: Long = 320L, maxH: Long = 240L): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      decoder.open() // per-partition codec/model init
      it.flatMap { m =>
        val meta = decoder.decode(m)
        val stride = (meta.n_frames + maxFrames - 1) / maxFrames // ceil → ≤ maxFrames rows
        val (ow, oh) = resizeFit(meta.width, meta.height, maxW, maxH)
        val idxs = (0L until meta.n_frames by stride).toSeq
        idxs.iterator.zip(decoder.frameHashes(m, idxs).iterator).map {
          case (i, fh) => FrameRow(m.doc_id, i, ow, oh, fh)
        }
      }
    }
  }

  // ---- deterministic synthetic media over the documents table ------------
  // Per-document P6 "video" whose shape and pixel bytes are closed forms
  // of doc_id — the generation the oracles recompute:
  //   w = doc_id % 8 + 2   (2..9)
  //   h = doc_id % 5 + 2   (2..6)
  //   nf = doc_id % 13 + 1 (1..13 frames; > 8 exercises strided sampling)
  //   pixel k of frame f = (doc_id*31 + f*17 + k) % 256
  private[graft] def mediaDims(id: Long): (Int, Int, Int) =
    ((id % 8 + 2).toInt, (id % 5 + 2).toInt, (id % 13 + 1).toInt)

  /** The documents table as a media corpus: one synthetic multi-frame P6
    * payload per doc_id. Generation is map-side (a closed form of the
    * id), so the gated queries measure the codec, not a data source.
    */
  private[graft] def syntheticMedia(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, nf) = mediaDims(id)
        MediaRow(id, Ppm.syntheticVideo(id, w, h, nf))
      })
  }

  // oracle fragment: per-doc generation parameters
  private val dimsSql =
    "SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 5 + 2 AS h," +
      " doc_id % 13 + 1 AS nf FROM documents"

  /** q32 — REAL-codec decode: every document's payload is parsed by
    * [[PpmDecoder]] (header tokens, frame splitting, dimension checks) and
    * the surfaced metadata is oracle-checked against the generation's
    * closed form — `n_bytes` includes the per-frame ASCII header, so a
    * header mis-parse or frame mis-split fails the gate.
    */
  val qMultimodal: QuerySpec = QuerySpec(
    "q32_multimodal",
    (s, dir) => decodeAll(syntheticMedia(s, dir), PpmDecoder).toDF(),
    Some(s"""WITH m AS ($dimsSql)
            | SELECT doc_id,
            |  CAST(nf * (9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
            |    + w * h * 3) AS BIGINT) AS n_bytes,
            |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
            |  CAST(nf AS BIGINT) AS n_frames
            | FROM m""".stripMargin.replaceAll("\n", "")))

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

  def extractFeatures(media: Dataset[MediaRow], dim: Int,
      encoder: MediaEncoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      encoder.open() // per-partition model init
      it.map(m => encoder.extract(m, dim))
    }
  }

  /** Q41 — REAL-codec feature extraction: [[PpmEncoder]]'s chunk-mean
    * fixed-point features over every decoded pixel byte, exploded to
    * scalar rows (like q22) so the oracle compare never depends on array
    * encodings. The oracle regenerates each pixel byte from the closed
    * form and aggregates the same integer chunk means — one flipped bit
    * anywhere in decode shifts a chunk sum and fails the hash.
    */
  val qFeatures: QuerySpec = QuerySpec(
    "q41_media_features",
    (s, dir) =>
      extractFeatures(syntheticMedia(s, dir), dim = 8, PpmEncoder).toDF()
        .select(col("doc_id"), posexplode(col("qfeat")))
        .select(col("doc_id"), col("pos").cast("long").as("j"), col("col").as("qf")),
    Some(s"""WITH m AS ($dimsSql),
            | px0 AS (SELECT doc_id, w, h, nf,
            |   unnest(range(0, nf * w * h * 3)) AS g FROM m),
            | px AS (SELECT doc_id, (g * 8) // (nf * w * h * 3) AS j,
            |   (doc_id * 31 + (g // (w * h * 3)) * 17 + (g % (w * h * 3))) % 256 AS v
            |  FROM px0)
            | SELECT doc_id, j, CAST(SUM(v) * 1000000 // COUNT(*) AS BIGINT) AS qf
            | FROM px GROUP BY doc_id, j""".stripMargin.replaceAll("\n", "")))

  /** Q36 — the full REAL-codec pipeline: decode → strided frame sample
    * (≤ 8 frames/doc) → aspect-fit resize → per-frame pixel fingerprint.
    * The fit box is (6, 4) so both resize branches run against the
    * synthetic dimensions (w ≤ 9, h ≤ 6): small frames pass through,
    * larger ones scale with the floor+clamp arithmetic the oracle
    * replicates. Fingerprints hash the DECODED pixel block ([[Ppm]]'s
    * byte fold), recomputed by the oracle from the generation formula.
    */
  val qFrames: QuerySpec = QuerySpec(
    "q36_frames",
    (s, dir) =>
      sampleFrames(syntheticMedia(s, dir), maxFrames = 8, PpmDecoder,
        maxW = 6L, maxH = 4L).toDF(),
    Some(s"""WITH m AS ($dimsSql),
            | rs AS (SELECT *, CASE WHEN w <= 6 AND h <= 4 THEN w
            |    ELSE greatest(1, CAST(floor(w * least(6.0 / w, 4.0 / h)) AS BIGINT)) END AS out_w,
            |   CASE WHEN w <= 6 AND h <= 4 THEN h
            |    ELSE greatest(1, CAST(floor(h * least(6.0 / w, 4.0 / h)) AS BIGINT)) END AS out_h
            |  FROM m),
            | fr AS (SELECT doc_id, w, h, out_w, out_h,
            |   unnest(range(0, nf, (nf + 7) // 8)) AS frame_idx FROM rs)
            | SELECT doc_id, frame_idx, out_w, out_h,
            |  list_reduce(list_transform(range(0, w * h * 3),
            |    k -> (doc_id * 31 + frame_idx * 17 + k) % 256),
            |   (x, y) -> (x * 31 + y) % ${graft.functions.PolyHash.P}) AS frame_hash
            | FROM fr""".stripMargin.replaceAll("\n", "")))

  /** q71 — the codec ROUND-TRIP gate on fixed-shape payloads: 4×4 2-frame
    * videos through [[Ppm.encodeFrame]] and back through the real
    * [[PpmDecoder]] — header parsing, frame splitting, batched pixel
    * fingerprints. The oracle recomputes each fingerprint from the
    * generation formula (the same value by construction instead of by
    * decoding), so the gate holds iff the encode→decode→hash path
    * preserves every pixel byte: any header mis-parse, frame mis-split,
    * or signed-byte slip shifts the hash. q32/q36/q41 gate the codec
    * inside the full pipelines over varying shapes; this is the minimal
    * isolated round-trip.
    *
    * Same scale shape as the other multimodal passes: one
    * `mapPartitions` (the codec seam — per-partition decoder init),
    * map-only, no shuffle.
    */
  val qPpmDecode: QuerySpec = QuerySpec(
    "q71_ppm_decode",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          PpmDecoder.open()
          it.flatMap { id =>
            val m = MediaRow(id, Ppm.syntheticVideo(id, 4, 4, 2))
            val meta = PpmDecoder.decode(m)
            val idxs = 0L until meta.n_frames
            idxs.zip(PpmDecoder.frameHashes(m, idxs)).map { case (f, fp) =>
              (id, f, meta.width, meta.height, fp)
            }
          }
        }
        .toDF("doc_id", "frame_idx", "width", "height", "frame_fp")
    },
    Some(s"""SELECT doc_id, f AS frame_idx,
            |  CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
            |  list_reduce(
            |    list_transform(range(0, 48), k -> (doc_id * 31 + f * 17 + k) % 256),
            |    (x, y) -> (x * 31 + y) % ${graft.functions.PolyHash.P}) AS frame_fp
            | FROM documents, range(0, 2) t(f)""".stripMargin
      .replaceAll("\n", "")))

  /** q77 — media similarity search: the composition the feature
    * extractor exists for — [[PpmEncoder]]'s fixed-point vectors flow
    * STRAIGHT into the engine's similarity kernels (integer
    * [[graft.functions.QDot]] cosine, the q19 shape) with no conversion
    * step: brute-force cosine top-10 media near-neighbors of doc 0's
    * features. Map-side decode+extract+cosine, one TakeOrdered — no
    * shuffle; at scale the same vectors feed the IVF/PQ index builds
    * instead of a brute-force scan. The oracle regenerates the features
    * from the pixel closed form (q41's oracle) and computes the same
    * integer-dot cosine.
    */
  val qMediaSimilarity: QuerySpec = QuerySpec(
    "q77_media_similarity",
    (s, dir) => {
      import graft.functions.Exact
      val feats = extractFeatures(syntheticMedia(s, dir), dim = 8, PpmEncoder)
        .toDF()
      val q = feats.filter(col("doc_id") === 0)
        .select(col("qfeat")).head().getSeq[Long](0)
      feats.select(col("doc_id"),
          Exact.cosineFromQuantized(col("qfeat"), typedlit(q)).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("doc_id"))
        .limit(10)
    },
    Some {
      import graft.functions.Exact
      s"""WITH m AS ($dimsSql),
         | px0 AS (SELECT doc_id, w, h, nf,
         |   unnest(range(0, nf * w * h * 3)) AS g FROM m),
         | px AS (SELECT doc_id, (g * 8) // (nf * w * h * 3) AS j,
         |   (doc_id * 31 + (g // (w * h * 3)) * 17 + (g % (w * h * 3))) % 256 AS v
         |  FROM px0),
         | f AS (SELECT doc_id, j, CAST(SUM(v) * 1000000 // COUNT(*) AS BIGINT) AS qf
         |  FROM px GROUP BY doc_id, j),
         | vv AS (SELECT doc_id, list(qf ORDER BY j) AS qv FROM f GROUP BY doc_id),
         | q AS (SELECT qv AS qqv FROM vv WHERE doc_id = 0)
         | SELECT vv.doc_id, ${Exact.cosineSql("vv.qv", "q.qqv")} AS cos_sim
         | FROM vv, q ORDER BY cos_sim DESC, doc_id LIMIT 10""".stripMargin
      .replaceAll("\n", "")
    })

  /** q100 — cross-video duplicate-frame detection: the media tier of the
    * dedup family. Every decoded frame's pixel fingerprint (the q71
    * hash) is the identity key; clusters of ≥2 fingerprints are frames
    * REUSED across videos (shared intros, thumbnails, stills) — the
    * per-frame complement of whole-asset dedup, reported as (cluster
    * size, #videos touched, canonical owner = lowest (doc, frame)).
    * On the synthetic corpus these clusters are real pixel-identical
    * frames (shape-compatible docs where `31·Δdoc + 17·Δframe ≡ 0
    * mod 256`), verified non-degenerate at every SF.
    *
    * Scale shape: decode is the usual per-partition-batched map
    * ([[decodeAll]]'s seam, frames bounded ≤13/doc so the explode is
    * bounded fan-out), then ONE hash aggregation on the fingerprint
    * with map-side combine — candidate frames meet only through the
    * fp equi-key, never a pair join. The within-cluster argmin is
    * deterministic because a doc contributes a fingerprint at most
    * once (frames within a doc are pairwise distinct by construction),
    * so `min_by(frame, doc)` has a unique extremum.
    */
  val qFrameDedup: QuerySpec = QuerySpec(
    "q100_frame_dedup",
    (s, dir) => {
      import s.implicits._
      syntheticMedia(s, dir)
        .mapPartitions { it =>
          PpmDecoder.open()
          it.flatMap { m =>
            val meta = PpmDecoder.decode(m)
            val idxs = 0L until meta.n_frames
            idxs.zip(PpmDecoder.frameHashes(m, idxs)).map { case (f, fp) =>
              (m.doc_id, f, fp)
            }
          }
        }
        .toDF("doc_id", "f", "fp")
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("canon_doc"),
          min_by(col("f"), col("doc_id")).as("canon_frame"))
        .filter(col("n_frames") >= 2)
    },
    Some(s"""WITH m AS ($dimsSql),
            | fr AS (SELECT doc_id, unnest(range(0, nf)) AS f, w, h FROM m),
            | fps AS (SELECT doc_id, f, list_reduce(
            |   list_transform(range(0, w * h * 3),
            |     k -> (doc_id * 31 + f * 17 + k) % 256),
            |   (x, y) -> (x * 31 + y) % ${graft.functions.PolyHash.P}) AS fp
            |  FROM fr)
            | SELECT fp, COUNT(*) AS n_frames,
            |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
            |  MIN(doc_id) AS canon_doc, arg_min(f, doc_id) AS canon_frame
            | FROM fps GROUP BY fp HAVING COUNT(*) >= 2""".stripMargin
      .replaceAll("\n", "")))

  val specs: Seq[QuerySpec] =
    Seq(qMultimodal, qFrames, qFeatures, qPpmDecode, qMediaSimilarity,
      qFrameDedup)
}
