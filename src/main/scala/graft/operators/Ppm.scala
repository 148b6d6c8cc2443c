package graft.operators

import graft.functions.PolyHash

/** A real, pure-JVM media codec behind the [[Multimodal.MediaDecoder]] /
  * [[Multimodal.MediaEncoder]] seams: binary PPM (P6 — the trivial
  * uncompressed RGB format: ASCII header `P6 <w> <h> <maxval>` then raw
  * RGB triples). A payload is one or MORE concatenated P6 frames, which
  * makes a "video" just a byte concatenation — so decode → strided frame
  * sample → resize → per-frame fingerprint runs on real pixel bytes.
  *
  * This IS the gated decoder: q32/q36/q41/q71 run it over deterministic
  * [[syntheticVideo]] payloads (the testdata corpus is text, so media
  * bytes are generated from `doc_id` by a closed form the oracles
  * recompute) — same contract, partition-batched pipelines, real parsing
  * with fail-fast corruption handling (media corruption must not
  * silently become wrong features — the vector-guard convention).
  */
object Ppm {

  /** One parsed frame: dimensions + the pixel block's position in the
    * payload (`length` = w·h·3 bytes, 8-bit channels).
    */
  final case class Frame(width: Int, height: Int, offset: Int, length: Int)

  /** Serialize one RGB frame as binary PPM (P6, maxval 255). */
  def encodeFrame(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3,
      s"rgb length ${rgb.length} != $w x $h x 3")
    s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ rgb
  }

  /** Deterministic multi-frame "video": `nFrames` concatenated P6 frames
    * where pixel byte k of frame f is `(docId*31 + f*17 + k) % 256` — the
    * closed form the gated oracles recompute, so encode → decode →
    * fingerprint is checkable without ever shipping media bytes to SQL.
    */
  def syntheticVideo(docId: Long, w: Int, h: Int, nFrames: Int): Array[Byte] =
    Array.concat((0 until nFrames).map { f =>
      encodeFrame(w, h, Array.tabulate(w * h * 3)(k =>
        ((docId * 31 + f * 17 + k) % 256).toByte))
    }: _*)

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  // next header token after whitespace/comments; returns (token, posAfter)
  private def token(b: Array[Byte], pos0: Int): (String, Int) = {
    var pos = pos0
    var skipping = true
    while (skipping && pos < b.length) {
      if (isWs(b(pos))) pos += 1
      else if (b(pos) == '#') { // comment runs to end of line
        while (pos < b.length && b(pos) != '\n') pos += 1
      } else skipping = false
    }
    val start = pos
    while (pos < b.length && !isWs(b(pos))) pos += 1
    require(pos > start, "truncated PPM header")
    (new String(b, start, pos - start,
      java.nio.charset.StandardCharsets.US_ASCII), pos)
  }

  private def intToken(b: Array[Byte], pos0: Int): (Int, Int) = {
    val (t, pos) = token(b, pos0)
    val v = try t.toInt catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"bad PPM header token '$t'")
    }
    require(v >= 0, s"negative PPM header value $v")
    (v, pos)
  }

  /** Parse every concatenated P6 frame. Strict: a malformed header, an
    * unsupported maxval, or a truncated pixel block throws — never a
    * silent partial decode.
    */
  def frames(bytes: Array[Byte]): Seq[Frame] = {
    val out = Seq.newBuilder[Frame]
    var pos = 0
    while (pos < bytes.length) {
      val (magic, p1) = token(bytes, pos)
      require(magic == "P6", s"expected P6 magic, got '$magic'")
      val (w, p2) = intToken(bytes, p1)
      val (h, p3) = intToken(bytes, p2)
      val (maxval, p4) = intToken(bytes, p3)
      require(maxval > 0 && maxval < 256,
        s"unsupported PPM maxval $maxval (8-bit channels only)")
      // exactly ONE whitespace byte separates the header from the pixels
      require(p4 < bytes.length && isWs(bytes(p4)), "truncated PPM header")
      val off = p4 + 1
      // Long product: an Int `w * h * 3` overflows on a crafted header
      // (e.g. 1431655766×1 wraps to 2), silently decoding a tiny pixel
      // block — the exact "corruption becomes wrong features" failure
      // this parser promises to fail fast on
      val lenL = w.toLong * h * 3L
      require(off + lenL <= bytes.length,
        s"truncated PPM pixel block: need $lenL bytes at $off, have ${bytes.length}")
      val len = lenL.toInt
      out += Frame(w, h, off, len)
      pos = off + len
    }
    out.result()
  }

  /** [[PolyHash]]-convention fold over raw bytes (unsigned): first byte
    * seeds the accumulator, empty hashes to 0.
    */
  def hashBytes(b: Array[Byte], off: Int, len: Int): Long = {
    if (len == 0) return 0L
    var h = (b(off) & 0xff).toLong
    var i = 1
    while (i < len) { h = (h * 31L + (b(off + i) & 0xff)) % PolyHash.P; i += 1 }
    h
  }
}

/** [[Multimodal.MediaDecoder]] over concatenated P6 frames: real header
  * parsing, per-frame pixel fingerprints.
  */
object PpmDecoder extends Multimodal.MediaDecoder {

  override def decode(m: Multimodal.MediaRow): Multimodal.MediaMeta = {
    val fs = Ppm.frames(m.media)
    require(fs.nonEmpty, "empty PPM payload")
    // a multi-frame payload is a video: every frame shares the dimensions
    fs.tail.foreach { f =>
      require(f.width == fs.head.width && f.height == fs.head.height,
        s"frame dimensions vary: ${fs.head.width}x${fs.head.height} vs ${f.width}x${f.height}")
    }
    Multimodal.MediaMeta(m.doc_id, m.media.length.toLong,
      fs.head.width.toLong, fs.head.height.toLong, fs.length.toLong)
  }

  override def frameHash(m: Multimodal.MediaRow, frameIdx: Long): Long = {
    val f = Ppm.frames(m.media)(frameIdx.toInt)
    Ppm.hashBytes(m.media, f.offset, f.length)
  }

  /** Batched fingerprints parse the container ONCE: the per-index
    * [[frameHash]] re-runs [[Ppm.frames]] per call, which is O(F²) header
    * scans over a real multi-frame video — the pipelines go through this
    * entry point.
    */
  override def frameHashes(m: Multimodal.MediaRow,
      frameIdxs: Seq[Long]): Seq[Long] = {
    val fs = Ppm.frames(m.media)
    frameIdxs.map { i =>
      val f = fs(i.toInt)
      Ppm.hashBytes(m.media, f.offset, f.length)
    }
  }
}

/** [[Multimodal.MediaEncoder]] over P6 payloads: fixed-point mean
  * intensity over `dim` contiguous pixel-byte chunks spanning all
  * frames — a real (if simple) content feature in the quantized integer
  * domain the ANN operators consume.
  */
object PpmEncoder extends Multimodal.MediaEncoder {

  override def extract(m: Multimodal.MediaRow, dim: Int): Multimodal.MediaFeatures = {
    val fs = Ppm.frames(m.media)
    val total = fs.map(_.length.toLong).sum
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var g = 0L
    fs.foreach { f =>
      var i = 0
      while (i < f.length) {
        val j = ((g * dim) / total).toInt
        sums(j) += (m.media(f.offset + i) & 0xff)
        counts(j) += 1
        g += 1
        i += 1
      }
    }
    Multimodal.MediaFeatures(m.doc_id, Array.tabulate(dim) { j =>
      if (counts(j) == 0) 0L else sums(j) * 1000000L / counts(j)
    })
  }
}
