package graft.multimodal

/** Decoded raster: `pixels` is row-major, channel-interleaved
  * (c = 1 grayscale, 3 RGB), one Int per sample in [0, 255]. */
case class Raster(width: Int, height: Int, channels: Int,
    pixels: Array[Int])

/** A REAL image codec with zero library dependencies: binary PNM
  * (P5 grayscale / P6 RGB, the Netpbm formats — a public spec simple
  * enough to parse in ~50 lines of JVM code). This is the existence
  * proof that the multimodal tier's decode slot is real engine
  * plumbing, not a permanent stub: compressed codecs (JPEG/PNG) slot
  * into the same [[decode]] signature when their libraries are
  * available, and everything downstream (resize, stats, features) is
  * already pixel-real.
  *
  * Strictness: [[decode]] returns None on anything malformed — wrong
  * magic, missing/oversized dimensions, truncated pixel payload,
  * maxval != 255 — never a partially-filled raster (the AdcFold
  * null-on-corruption discipline).
  */
object PnmCodec {

  private final val MaxSide = 1 << 15

  /** Parse a binary PGM (P5) or PPM (P6) payload. Header grammar per
    * the Netpbm spec: magic, whitespace/comment-separated width,
    * height, maxval, ONE whitespace byte, then raw samples. */
  def decode(bytes: Array[Byte]): Option[Raster] = {
    if (bytes == null || bytes.length < 4) return None
    if (bytes(0) != 'P') return None
    val channels = bytes(1) match {
      case '5' => 1
      case '6' => 3
      case _ => return None
    }
    var pos = 2
    // read the next whitespace/comment-separated unsigned int
    def nextInt(): Int = {
      var inComment = false
      while (pos < bytes.length && {
        val b = bytes(pos)
        if (inComment) { if (b == '\n') inComment = false; true }
        else if (b == '#') { inComment = true; true }
        else b == ' ' || b == '\t' || b == '\n' || b == '\r'
      }) pos += 1
      var v = -1
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        val d = bytes(pos) - '0'
        v = (if (v < 0) 0 else v) * 10 + d
        if (v > 0x3fffffff) return -1
        pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || w > MaxSide || h > MaxSide) return None
    if (maxval != 255) return None // 2-byte samples out of scope
    // exactly one whitespace byte separates maxval from the samples
    if (pos >= bytes.length) return None
    val sep = bytes(pos)
    if (sep != ' ' && sep != '\t' && sep != '\n' && sep != '\r') return None
    pos += 1
    val n = w.toLong * h * channels
    if (n > Int.MaxValue || bytes.length - pos < n) return None
    val px = new Array[Int](n.toInt)
    var i = 0
    while (i < px.length) { px(i) = bytes(pos + i) & 0xff; i += 1 }
    Some(Raster(w, h, channels, px))
  }

  /** Encode a raster as binary P5/P6 — the test-side inverse (round
    * trip pinned in MultimodalSpec) and the writer a re-encode step
    * would use. */
  def encode(r: Raster): Array[Byte] = {
    require(r.channels == 1 || r.channels == 3,
      s"PNM supports 1 or 3 channels, got ${r.channels}")
    require(r.pixels.length == r.width * r.height * r.channels,
      "pixel array does not match declared dimensions")
    val magic = if (r.channels == 1) "P5" else "P6"
    val header = s"$magic\n${r.width} ${r.height}\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + r.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < r.pixels.length) {
      out(header.length + i) = (r.pixels(i) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Nearest-neighbor resize — pure integer arithmetic
    * (src = floor(dst · srcDim / dstDim), the canonical mapping), so
    * the resampling replays exactly cross-engine. */
  def resizeNearest(r: Raster, dw: Int, dh: Int): Raster = {
    require(dw > 0 && dh > 0, s"resize target must be positive: ${dw}x$dh")
    val px = new Array[Int](dw * dh * r.channels)
    var y = 0
    while (y < dh) {
      val sy = (y.toLong * r.height / dh).toInt
      var x = 0
      while (x < dw) {
        val sx = (x.toLong * r.width / dw).toInt
        var c = 0
        while (c < r.channels) {
          px((y * dw + x) * r.channels + c) =
            r.pixels((sy * r.width + sx) * r.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(dw, dh, r.channels, px)
  }

  /** Per-raster sample statistics (all samples, channel-pooled):
    * exact integer sum so the mean is bit-reproducible as sum/count
    * in any engine. */
  def stats(r: Raster): (Long, Int, Int) = {
    var sum = 0L
    var mn = 255
    var mx = 0
    var i = 0
    while (i < r.pixels.length) {
      val v = r.pixels(i)
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    (sum, if (r.pixels.isEmpty) 0 else mn, mx)
  }
}
