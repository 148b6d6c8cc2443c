package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The decoder/encoder are injection points, not edits: a custom
  * implementation flows through the partition-batched pipelines and its
  * per-partition `open()` hook runs.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {
  import Multimodal._

  test("q100: frame dedup finds pixel-identical clusters spanning videos") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val rows = Multimodal.qFrameDedup.build(spark, dir).collect()
    assert(rows.nonEmpty, "no duplicate-frame clusters on the gate corpus")
    // every cluster spans ≥2 videos: frames within one doc are pairwise
    // distinct by the generation formula, so n_docs == n_frames
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1),
        s"cluster ${r.getLong(0)} repeats a doc: $r")
      assert(r.getLong(2) >= 2)
    }
  }

  private object FixedDecoder extends MediaDecoder {
    override def decode(m: MediaRow): MediaMeta =
      MediaMeta(m.doc_id, m.media.length.toLong, 640L, 480L, n_frames = 4L)
    override def frameHash(m: MediaRow, frameIdx: Long): Long = 1000L + frameIdx
  }

  test("a custom MediaDecoder is injected without touching the pipeline") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, "abc".getBytes), MediaRow(2L, "defg".getBytes)).toDS()

    val meta = decodeAll(media, FixedDecoder).collect().toSeq.sortBy(_.doc_id)
    assert(meta.map(m => (m.doc_id, m.width, m.height, m.n_frames)) ==
      Seq((1L, 640L, 480L, 4L), (2L, 640L, 480L, 4L)))

    val frames = sampleFrames(media, maxFrames = 8, FixedDecoder)
      .collect().toSeq.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    // 4 frames at maxFrames=8 → stride 1, resize 640×480 → fit 320×240
    assert(frames.map(f => (f.frame_idx, f.out_w, f.out_h, f.frame_hash)) ==
      (0L until 4L).map(i => (i, 320L, 240L, 1000L + i)))
  }

  test("PPM codec: decode -> sample -> fingerprint runs on real pixel bytes") {
    import spark.implicits._
    // a two-frame 4x2 "video" (concatenated P6 frames) + a single-frame
    // extreme-aspect image that exercises the resize clamp
    val f0 = Array.tabulate(4 * 2 * 3)(i => i.toByte)
    val f1 = Array.tabulate(4 * 2 * 3)(i => (255 - i).toByte)
    val video = Ppm.encodeFrame(4, 2, f0) ++ Ppm.encodeFrame(4, 2, f1)
    val wide = Ppm.encodeFrame(998, 1, Array.fill(998 * 3)(7.toByte))
    val media = Seq(MediaRow(1L, video), MediaRow(2L, wide)).toDS()

    val meta = decodeAll(media, PpmDecoder).collect().sortBy(_.doc_id)
    assert(meta(0) == MediaMeta(1L, video.length.toLong, 4L, 2L, 2L))
    assert(meta(1) == MediaMeta(2L, wide.length.toLong, 998L, 1L, 1L))

    // independent expected fingerprint: a plain fold over the known pixels
    def fold(bs: Array[Byte]): Long = bs.map(b => (b & 0xff).toLong)
      .reduceLeft((h, b) => (h * 31L + b) % 2147483647L)
    val frames = sampleFrames(media, maxFrames = 8, PpmDecoder).collect()
    val v = frames.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(v.map(f => (f.frame_idx, f.out_w, f.out_h, f.frame_hash)).toSeq ==
      Seq((0L, 4L, 2L, fold(f0)), (1L, 4L, 2L, fold(f1))))
    // 998x1 aspect-fits to 320 wide; the height floor clamps to 1
    assert(frames.filter(_.doc_id == 2L).map(f => (f.out_w, f.out_h)).toSeq
      == Seq((320L, 1L)))

    // headers may carry comments
    val commented = ("P6\n# a comment\n4 2\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)) ++ f0
    assert(PpmDecoder.decode(MediaRow(3L, commented))
      == MediaMeta(3L, commented.length.toLong, 4L, 2L, 1L))

    // corruption fails fast, never a silent partial decode
    intercept[IllegalArgumentException] {
      PpmDecoder.decode(MediaRow(4L, "P5\n4 2\n255\n".getBytes ++ f0))
    }
    intercept[IllegalArgumentException] {
      PpmDecoder.decode(MediaRow(5L, video.dropRight(3)))
    }
    // crafted dimensions whose Int product wraps (1431655766*1*3 = 2,
    // 715827883*1*3 = -2147483647): both must fail the Long-product
    // truncation guard, not silently decode a tiny block or walk pos
    // backwards into an ArrayIndexOutOfBounds
    intercept[IllegalArgumentException] {
      PpmDecoder.decode(MediaRow(6L,
        "P6\n1431655766 1\n255\n".getBytes ++ Array[Byte](0, 0)))
    }
    intercept[IllegalArgumentException] {
      PpmDecoder.decode(MediaRow(7L,
        "P6\n715827883 1\n255\n".getBytes ++ Array[Byte](0, 0)))
    }
  }

  test("batched frameHashes ≡ per-index frameHash, parsing the container once") {
    val m = MediaRow(9L, Ppm.syntheticVideo(9L, 3, 2, 5))
    val idxs = Seq(0L, 2L, 4L)
    assert(PpmDecoder.frameHashes(m, idxs) == idxs.map(PpmDecoder.frameHash(m, _)))
  }

  test("synthetic video matches the closed form the gated oracles recompute") {
    val (w, h, nf) = Multimodal.mediaDims(42L) // 42%8+2=4, 42%5+2=4, 42%13+1=4
    assert((w, h, nf) == (4, 4, 4))
    val m = MediaRow(42L, Ppm.syntheticVideo(42L, w, h, nf))
    val meta = PpmDecoder.decode(m)
    assert(meta == MediaMeta(42L, nf.toLong * (11 + w * h * 3), w.toLong, h.toLong, nf.toLong))
    // frame 3's fingerprint from the formula, independent of the parser
    val expected = (0 until w * h * 3).map(k => (42L * 31 + 3 * 17 + k) % 256)
      .reduceLeft((a, b) => (a * 31 + b) % 2147483647L)
    assert(PpmDecoder.frameHash(m, 3L) == expected)
  }

  test("PPM encoder extracts fixed-point chunk-mean features from real pixels") {
    import spark.implicits._
    val px = Array.tabulate(2 * 2 * 3)(i => i.toByte) // bytes 0..11
    val media = Seq(MediaRow(7L, Ppm.encodeFrame(2, 2, px))).toDS()
    val feats = extractFeatures(media, dim = 3, PpmEncoder).collect().head
    // 4-byte chunks: means 1.5, 5.5, 9.5 -> fixed-point 1e6
    assert(feats.qfeat.toSeq == Seq(1500000L, 5500000L, 9500000L))
  }

  test("a custom MediaEncoder is injected without touching the pipeline") {
    import spark.implicits._
    val enc = new MediaEncoder {
      override def extract(m: MediaRow, dim: Int): MediaFeatures =
        MediaFeatures(m.doc_id, Array.tabulate(dim)(_.toLong * m.doc_id))
    }
    val media = Seq(MediaRow(3L, "xyz".getBytes)).toDS()
    val feats = extractFeatures(media, dim = 4, enc).collect().head
    assert(feats.qfeat.toSeq == Seq(0L, 3L, 6L, 9L))
  }
}
