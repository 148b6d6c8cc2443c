package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The decoder/encoder are injection points, not edits: a custom
  * implementation flows through the partition-batched pipelines and its
  * per-partition `open()` hook runs.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {
  import Multimodal._

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
