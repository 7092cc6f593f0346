package graft.multimodal

/** One decoded video frame: planar YCbCr samples, one Int per sample
  * in [0, 255]. `y` is width×height row-major; `cb`/`cr` are the
  * subsampled chroma planes (quarter-size for 4:2:0, full-size for
  * 4:4:4, empty for mono). */
case class VideoFrame(y: Array[Int], cb: Array[Int], cr: Array[Int])

/** Decoded video: fixed per-stream dimensions and colorspace, frames
  * in stream order. */
case class Y4mVideo(width: Int, height: Int, colorspace: String,
    frames: Array[VideoFrame])

/** A REAL video container codec with zero library dependencies:
  * YUV4MPEG2 (.y4m) — the [[PnmCodec]]/[[WavCodec]] move for the
  * THIRD modality (the canonical uncompressed video interchange
  * format: an ASCII parameter header, then "FRAME"-delimited raw
  * planar frames; the public grammar mjpegtools ships). Compressed
  * codecs (H.264/VP9) slot into the same [[decode]] signature when
  * their libraries are available; everything downstream (per-frame
  * stats, frame embeddings, temporal dedup) operates on actual
  * samples at TRUE frame boundaries — replacing the byte-window
  * approximation `Multimodal.sampleFrames` documents.
  *
  * Strictness: [[decode]] returns None on anything malformed — wrong
  * magic, missing/invalid W/H tags, odd dimensions under 4:2:0
  * subsampling, an unsupported colorspace tag, a truncated frame
  * payload, garbage where a FRAME marker should be — never a
  * partially-filled frame list (the AdcFold null-on-corruption
  * discipline).
  *
  * Supported colorspaces: the C420 family (C420, C420jpeg, C420paldv,
  * C420mpeg2 — identical plane layout, different chroma siting which
  * raw-sample analytics does not interpret), C444, and Cmono. Absent
  * C tag defaults to C420jpeg per the spec's common practice.
  */
object Y4mCodec {

  private final val MaxSide = 1 << 15
  private val Magic = "YUV4MPEG2".getBytes("US-ASCII")

  private def chromaSamples(cs: String, w: Int, h: Int): Int = cs match {
    case "mono" => 0
    case "444"  => w * h
    case _      => (w / 2) * (h / 2) // 420 family; dims checked even
  }

  /** Parse a YUV4MPEG2 payload. Grammar: "YUV4MPEG2" then
    * space-prefixed parameter tags up to '\n' (W/H/C interpreted,
    * F/I/A/X validated as non-empty and skipped), then per frame:
    * "FRAME" + optional space-prefixed tags + '\n' + the raw planes
    * (Y, then Cb, Cr when present). */
  def decode(bytes: Array[Byte]): Option[Y4mVideo] = {
    if (bytes == null || bytes.length < Magic.length + 1) return None
    var i = 0
    while (i < Magic.length) {
      if (bytes(i) != Magic(i)) return None
      i += 1
    }
    var pos = Magic.length
    var w = -1
    var h = -1
    var cs = "420jpeg"
    // header parameter list: each tag is ' ' + letter + value
    while (pos < bytes.length && bytes(pos) != '\n') {
      if (bytes(pos) != ' ') return None
      pos += 1
      if (pos >= bytes.length) return None
      val tag = bytes(pos).toChar
      pos += 1
      val v0 = pos
      while (pos < bytes.length && bytes(pos) != ' ' && bytes(pos) != '\n')
        pos += 1
      val value = new String(bytes, v0, pos - v0, "US-ASCII")
      if (value.isEmpty) return None
      tag match {
        case 'W' => w = parsePositiveInt(value); if (w < 0) return None
        case 'H' => h = parsePositiveInt(value); if (h < 0) return None
        case 'C' =>
          if (!Set("420", "420jpeg", "420paldv", "420mpeg2", "444",
            "mono").contains(value)) return None
          cs = value
        case 'F' | 'I' | 'A' | 'X' => () // validated non-empty, skipped
        case _ => return None
      }
    }
    if (pos >= bytes.length) return None // header never terminated
    pos += 1 // the header '\n'
    if (w <= 0 || h <= 0 || w > MaxSide || h > MaxSide) return None
    if (cs.startsWith("420") && ((w & 1) == 1 || (h & 1) == 1))
      return None // 4:2:0 needs even dimensions
    val nY = w * h
    val nC = chromaSamples(cs, w, h)
    val frames = scala.collection.mutable.ArrayBuffer.empty[VideoFrame]
    val marker = "FRAME".getBytes("US-ASCII")
    while (pos < bytes.length) {
      // FRAME marker + optional parameters up to '\n'
      if (pos + marker.length > bytes.length) return None
      var j = 0
      while (j < marker.length) {
        if (bytes(pos + j) != marker(j)) return None
        j += 1
      }
      pos += marker.length
      while (pos < bytes.length && bytes(pos) != '\n') {
        if (bytes(pos) != ' ') return None
        pos += 1
        val v0 = pos
        while (pos < bytes.length && bytes(pos) != ' ' && bytes(pos) != '\n')
          pos += 1
        if (pos == v0) return None // bare trailing space
      }
      if (pos >= bytes.length) return None // frame header never terminated
      pos += 1 // the frame '\n'
      if (bytes.length - pos < nY + 2L * nC) return None // truncated
      def plane(n: Int): Array[Int] = {
        val p = new Array[Int](n)
        var k = 0
        while (k < n) { p(k) = bytes(pos + k) & 0xff; k += 1 }
        pos += n
        p
      }
      val y = plane(nY)
      val cb = plane(nC)
      val cr = plane(nC)
      frames += VideoFrame(y, cb, cr)
    }
    if (frames.isEmpty) return None // a stream with no frames
    Some(Y4mVideo(w, h, cs, frames.toArray))
  }

  private def parsePositiveInt(s: String): Int = {
    var v = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return -1
      v = v * 10 + (c - '0')
      if (v > 0x3fffffff) return -1
      i += 1
    }
    if (i == 0) -1 else v
  }

  /** Encode as YUV4MPEG2 — the test-side inverse (round trip pinned
    * in MultimodalSpec) and the writer a re-encode step would use. */
  def encode(v: Y4mVideo): Array[Byte] = {
    require(v.width > 0 && v.height > 0, "dimensions must be positive")
    require(Set("420", "420jpeg", "420paldv", "420mpeg2", "444",
      "mono").contains(v.colorspace), s"colorspace ${v.colorspace}")
    require(!v.colorspace.startsWith("420") ||
      ((v.width & 1) == 0 && (v.height & 1) == 0),
      "4:2:0 needs even dimensions")
    require(v.frames.nonEmpty, "a stream needs at least one frame")
    val nY = v.width * v.height
    val nC = chromaSamples(v.colorspace, v.width, v.height)
    v.frames.foreach { f =>
      require(f.y.length == nY && f.cb.length == nC && f.cr.length == nC,
        "frame planes do not match declared dimensions/colorspace")
    }
    val header =
      s"YUV4MPEG2 W${v.width} H${v.height} F25:1 Ip A1:1 C${v.colorspace}\n"
        .getBytes("US-ASCII")
    val fh = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + v.frames.length * (fh.length + nY + 2 * nC))
    out.put(header)
    v.frames.foreach { f =>
      out.put(fh)
      def put(p: Array[Int]): Unit = {
        var i = 0
        while (i < p.length) {
          val s = p(i)
          require(s >= 0 && s <= 255, s"sample out of byte range: $s")
          out.put((s & 0xff).toByte)
          i += 1
        }
      }
      put(f.y); put(f.cb); put(f.cr)
    }
    out.array()
  }

  /** Per-frame luma statistics (exact integer sum so the mean is
    * bit-reproducible as sum/count in any engine). */
  def lumaStats(f: VideoFrame): (Long, Int, Int) = {
    var sum = 0L
    var mn = 255
    var mx = 0
    var i = 0
    while (i < f.y.length) {
      val v = f.y(i)
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    (sum, if (f.y.isEmpty) 0 else mn, mx)
  }
}
