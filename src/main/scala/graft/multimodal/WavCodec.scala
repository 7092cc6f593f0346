package graft.multimodal

/** Decoded PCM audio: interleaved signed 16-bit samples (one Int per
  * sample in [-32768, 32767], channel-interleaved frame order). */
case class PcmAudio(channels: Int, sampleRate: Int, samples: Array[Int])

/** A REAL audio codec with zero library dependencies: RIFF/WAVE with
  * 16-bit PCM — the [[PnmCodec]] move for the second modality (the
  * canonical uncompressed container, a public spec parseable in ~70
  * lines of JVM code). Compressed codecs (MP3/AAC/FLAC) slot into the
  * same [[decode]] signature when their libraries are available;
  * everything downstream (stats, features) operates on actual
  * samples.
  *
  * Strictness: [[decode]] returns None on anything malformed — wrong
  * RIFF/WAVE magic, declared RIFF size disagreeing with the payload,
  * truncated or overlapping chunks, a data chunk before fmt, a
  * non-PCM format code, bits-per-sample != 16, zero channels, a data
  * size that is not a whole number of frames — never a
  * partially-filled buffer (the AdcFold null-on-corruption
  * discipline).
  */
object WavCodec {

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], p: Int, t: String): Boolean =
    b(p) == t.charAt(0) && b(p + 1) == t.charAt(1) &&
      b(p + 2) == t.charAt(2) && b(p + 3) == t.charAt(3)

  /** Parse a RIFF/WAVE payload carrying 16-bit PCM. Chunk walk per
    * the RIFF grammar: 12-byte RIFF/WAVE header, then id(4) +
    * size(4, LE) + data (+1 pad byte when size is odd); fmt must
    * precede data; unknown chunks are skipped. */
  def decode(bytes: Array[Byte]): Option[PcmAudio] = {
    if (bytes == null || bytes.length < 12) return None
    if (!tag(bytes, 0, "RIFF")) return None
    if (u32(bytes, 4) != bytes.length - 8L) return None
    if (!tag(bytes, 8, "WAVE")) return None
    var pos = 12
    var channels = 0
    var sampleRate = 0
    var haveFmt = false
    while (pos + 8 <= bytes.length) {
      val size = u32(bytes, pos + 4)
      if (size > bytes.length - (pos + 8)) return None
      val body = pos + 8
      if (tag(bytes, pos, "fmt ")) {
        if (size < 16) return None
        if (u16(bytes, body) != 1) return None // PCM only
        channels = u16(bytes, body + 2)
        if (channels < 1) return None
        val rate = u32(bytes, body + 4)
        if (rate < 1 || rate > Int.MaxValue) return None
        sampleRate = rate.toInt
        if (u16(bytes, body + 14) != 16) return None // int16 only
        haveFmt = true
      } else if (tag(bytes, pos, "data")) {
        if (!haveFmt) return None
        if (size % (2L * channels) != 0) return None // whole frames
        val n = (size / 2).toInt
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          val v = u16(bytes, body + 2 * i)
          samples(i) = if (v >= 0x8000) v - 0x10000 else v
          i += 1
        }
        return Some(PcmAudio(channels, sampleRate, samples))
      }
      pos = body + size.toInt + (size.toInt & 1) // odd chunks pad
    }
    None // no data chunk (or trailing garbage shorter than a header)
  }

  /** Encode PCM as RIFF/WAVE — the test-side inverse (round trip
    * pinned in MultimodalSpec) and the writer a re-encode step would
    * use. */
  def encode(a: PcmAudio): Array[Byte] = {
    require(a.channels >= 1, s"need >= 1 channel, got ${a.channels}")
    require(a.samples.length % a.channels == 0,
      "sample count is not a whole number of frames")
    val dataSize = a.samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putTag(p: Int, t: String): Unit = {
      var i = 0
      while (i < 4) { out(p + i) = t.charAt(i).toByte; i += 1 }
    }
    def put16(p: Int, v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(p: Int, v: Long): Unit = {
      var i = 0
      while (i < 4) { out(p + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    putTag(0, "RIFF"); put32(4, 36L + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16L)
    put16(20, 1); put16(22, a.channels)
    put32(24, a.sampleRate.toLong)
    put32(28, a.sampleRate.toLong * a.channels * 2)
    put16(32, a.channels * 2); put16(34, 16)
    putTag(36, "data"); put32(40, dataSize.toLong)
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i)
      // fail-fast like every other encode require (ADVICE r19): an
      // out-of-contract sample would otherwise wrap through & 0xffff
      // and round-trip to a DIFFERENT value — silent corruption in a
      // codec whose decoder rejects every malformed class strictly
      require(s >= Short.MinValue && s <= Short.MaxValue,
        s"sample $i out of int16 range: $s")
      put16(44 + 2 * i, s & 0xffff)
      i += 1
    }
    out
  }

  /** Per-payload sample statistics (all samples, channel-pooled):
    * exact integer sum so the mean is bit-reproducible as sum/count
    * in any engine. */
  def stats(a: PcmAudio): (Long, Int, Int) = {
    if (a.samples.isEmpty) return (0L, 0, 0)
    var sum = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var i = 0
    while (i < a.samples.length) {
      val v = a.samples(i)
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    (sum, mn, mx)
  }
}
