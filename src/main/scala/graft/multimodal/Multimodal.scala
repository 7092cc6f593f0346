package graft.multimodal

import org.apache.spark.sql.Dataset

/** Opaque media blob with typed metadata (SURVEY.md §2c #47). The binary
  * payload is never interpreted by Catalyst — only by the decode step. */
case class Media(media_id: Long, kind: String, bytes: Array[Byte],
    width: Int, height: Int, sample_rate: Int)

/** Fixed-width feature row produced by decode + feature extraction. */
case class MediaFeature(media_id: Long, kind: String, n_bytes: Int,
    checksum: Long, features: Array[Float])

/** One sampled frame of a video/audio blob. */
case class Frame(media_id: Long, frame_idx: Int, offset: Int, checksum: Long)

/** Decode verdict + exact pixel statistics of one media payload
  * (REAL decode — see [[PnmCodec]]): integer sum so the mean replays
  * bit-exactly as sum/count in any engine. `decoded` false = the
  * payload is not a parseable PNM (stats columns null-equivalent
  * zeros; a real build would route such rows to the JPEG/PNG codec
  * or a dead-letter side output). */
case class RasterStats(media_id: Long, decoded: Boolean, width: Int,
    height: Int, channels: Int, n_pixels: Int, px_sum: Long,
    px_min: Int, px_max: Int)

/** One media payload resized to fixed dimensions, pixels serialized
  * as a comma-joined string (engine-portable for the oracle). */
case class ResizedRow(media_id: Long, width: Int, height: Int,
    pixels: String)

/** Deterministic pixel-feature embedding of one media payload (r19 —
  * the image → embedding bridge): `e` is the gw·gh grid of mean-pooled
  * patch intensities, centered by the image's own mean. `decoded`
  * false (empty `e`) = unparseable payload OR raster smaller than the
  * grid — the dead-letter shape. */
case class MediaEmbedding(media_id: Long, decoded: Boolean,
    e: Array[Double])

/** Decode verdict + exact PCM sample statistics of one audio payload
  * (REAL decode — see [[WavCodec]]): integer sum of int16 samples so
  * the mean replays bit-exactly as sum/count in any engine. */
case class AudioStats(media_id: Long, decoded: Boolean, channels: Int,
    sample_rate: Int, n_samples: Int, s_sum: Long, s_min: Int,
    s_max: Int)

/** Decode verdict + exact luma statistics of ONE FRAME of a video
  * payload (REAL container decode — see [[Y4mCodec]]): integer sums,
  * so every column replays bit-exactly from the source bytes. */
case class FrameStats(media_id: Long, frame_idx: Int, decoded: Boolean,
    width: Int, height: Int, n_pixels: Int, y_sum: Long, y_min: Int,
    y_max: Int)

/** Per-frame grid-feature embedding (r20 — [[MediaEmbedding]] at
  * frame granularity, the temporal-dedup input). */
case class FrameEmbedding(media_id: Long, frame_idx: Int,
    decoded: Boolean, e: Array[Double])

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition so one task holds one
  * codec context (the real-world decode libraries are heavyweight to
  * initialize — the per-partition shape is the part that matters at
  * 100 TB, where a row-at-a-time UDF would re-init per record).
  *
  * Decode honesty, tier by tier (r18): the PNM family (binary
  * PGM/PPM) decodes FOR REAL — [[PnmCodec]] is a zero-dependency
  * parser, and resize/stats/feature steps below it operate on actual
  * pixels (mm_decode / mm_resize replay the pixel arithmetic from the
  * source bytes in DuckDB). Compressed codecs (JPEG/PNG/audio) remain
  * STUBS — this container has no codec libraries — behind the same
  * signatures, replaced by a deterministic fake that hashes the
  * payload. The Spark-side plumbing (schema, encoders, partitioning,
  * per-partition batching, flatMap fan-out) is real and tested either
  * way.
  */
object Multimodal {

  /** STUB: deterministic fake decode. A real build links an image/audio
    * codec here (e.g. JPEG decode → pixel array); the fake derives a
    * feature vector from a rolling hash of the payload so results are
    * reproducible and schema-correct. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L // FNV-ish rolling hash
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      out(i % dim) += (h & 0xffff) / 65536.0f
      i += 1
    }
    out
  }

  private def checksum(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xff); i += 1 }
    h
  }

  /** Decode + featurize, one codec context per partition. */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: init codec once here, reuse across the partition
      it.map { m =>
        MediaFeature(m.media_id, m.kind, m.bytes.length, checksum(m.bytes),
          decodeStub(m.bytes, dim))
      }
    }
  }

  /** Frame sampling for video-ish blobs: every strideBytes window becomes
    * one frame row (fan-out via per-partition flatMap; a real build reads
    * container frame offsets instead). */
  def sampleFrames(media: Dataset[Media], strideBytes: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = math.max(1, m.bytes.length / strideBytes)
      (0 until n).map { f =>
        val off = f * strideBytes
        val end = math.min(off + strideBytes, m.bytes.length)
        Frame(m.media_id, f, off, checksum(java.util.Arrays.copyOfRange(m.bytes, off, end)))
      }
    }
  }

  /** REAL decode + exact pixel statistics, one parse per row,
    * per-partition iteration (no codec context needed for PNM, but
    * the shape matches the compressed-codec path that does). */
  def decodeStats(media: Dataset[Media]): Dataset[RasterStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        PnmCodec.decode(m.bytes) match {
          case Some(r) =>
            val (sum, mn, mx) = PnmCodec.stats(r)
            RasterStats(m.media_id, decoded = true, r.width, r.height,
              r.channels, r.pixels.length, sum, mn, mx)
          case None =>
            RasterStats(m.media_id, decoded = false, 0, 0, 0, 0, 0L, 0, 0)
        }
      }
    }
  }

  /** REAL pixel resize: decode, nearest-neighbor resample (pure
    * integer source mapping — replays exactly cross-engine), emit the
    * resized samples as a portable comma-joined string. Undecodable
    * payloads yield an empty pixel string (the dead-letter shape). */
  def resizePixels(media: Dataset[Media], dw: Int,
      dh: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        PnmCodec.decode(m.bytes) match {
          case Some(r) =>
            val rs = PnmCodec.resizeNearest(r, dw, dh)
            ResizedRow(m.media_id, dw, dh, rs.pixels.mkString(","))
          case None => ResizedRow(m.media_id, dw, dh, "")
        }
      }
    }
  }

  /** Mean-pooled grid-patch feature kernel (r19 — the image →
    * embedding bridge the ANN/dedup tier consumes): partition the
    * raster into a gw×gh grid (patch (gy,gx) covers pixel rows
    * [⌊gy·h/gh⌋, ⌊(gy+1)·h/gh⌋) × cols [⌊gx·w/gw⌋, ⌊(gx+1)·w/gw⌋),
    * channel-pooled), each feature = the patch's exact integer pixel
    * sum / its pixel count, centered by the image's own global mean.
    *
    * Why this exact arithmetic: integer sums ⇒ the only float ops are
    * one division per patch and one subtraction — the identical IEEE
    * sequence any engine evaluates from the same bytes, so the
    * embedding (and every cosine downstream) replays bit-exactly in
    * DuckDB. The per-image centering is the photometric
    * normalization that makes cosine discriminative: raw intensity
    * vectors of unrelated images all sit in the positive orthant
    * (cos > 0.9 corpus-wide); centered ones behave like Pearson
    * correlation of the pixel layout. */
  def gridFeatureVec(r: Raster, gw: Int, gh: Int): Array[Double] = {
    require(gw > 0 && gh > 0, s"feature grid must be positive: ${gw}x$gh")
    require(r.width >= gw && r.height >= gh,
      s"raster ${r.width}x${r.height} smaller than feature grid ${gw}x$gh")
    var total = 0L
    var i = 0
    while (i < r.pixels.length) { total += r.pixels(i); i += 1 }
    val mu = total.toDouble / r.pixels.length
    val out = new Array[Double](gw * gh)
    // Long bounds (ADVICE r19): gy·height is Int-safe for any raster
    // the require admits, but the same floor-boundary formula in
    // audioEnergyVec overflowed at ~268M samples — keep the two
    // kernels on the identical Long discipline (resizeNearest's).
    var gy = 0
    while (gy < gh) {
      val y0 = (gy.toLong * r.height / gh).toInt
      val y1 = ((gy + 1).toLong * r.height / gh).toInt
      var gx = 0
      while (gx < gw) {
        val x0 = (gx.toLong * r.width / gw).toInt
        val x1 = ((gx + 1).toLong * r.width / gw).toInt
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            var c = 0
            while (c < r.channels) {
              sum += r.pixels((y * r.width + x) * r.channels + c)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val cnt = (y1 - y0).toLong * (x1 - x0) * r.channels
        out(gy * gw + gx) = sum.toDouble / cnt - mu
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Decode + grid-feature embedding, per-partition (the
    * [[extractFeatures]] shape with a REAL kernel): each payload
    * becomes an `e: array<double>` row the existing similarity/dedup
    * operators consume unchanged. Undecodable payloads — and rasters
    * smaller than the grid, whose patches would be empty — get the
    * dead-letter row (decoded = false, empty e). */
  def embedMedia(media: Dataset[Media], gw: Int,
      gh: Int): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        PnmCodec.decode(m.bytes) match {
          case Some(r) if r.width >= gw && r.height >= gh =>
            MediaEmbedding(m.media_id, decoded = true,
              gridFeatureVec(r, gw, gh))
          case _ =>
            MediaEmbedding(m.media_id, decoded = false,
              Array.empty[Double])
        }
      }
    }
  }

  /** REAL audio decode + exact PCM sample statistics ([[WavCodec]] —
    * the [[decodeStats]] twin for the second modality). Integer
    * arithmetic only, so every column replays from the source bytes
    * in any engine. */
  def audioStats(media: Dataset[Media]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        WavCodec.decode(m.bytes) match {
          case Some(a) =>
            val (sum, mn, mx) = WavCodec.stats(a)
            AudioStats(m.media_id, decoded = true, a.channels,
              a.sampleRate, a.samples.length, sum, mn, mx)
          case None =>
            AudioStats(m.media_id, decoded = false, 0, 0, 0, 0L, 0, 0)
        }
      }
    }
  }

  /** Windowed audio-energy feature kernel (r19 — the audio twin of
    * [[gridFeatureVec]], so BOTH real decoders feed the ANN/dedup
    * tier): split the PCM samples into `windows` floor-boundary
    * spans (window w covers [⌊w·n/W⌋, ⌊(w+1)·n/W⌋), channel-pooled),
    * each feature = the window's exact integer sum of squared
    * samples / its sample count, centered by the payload's global
    * mean square — energy contour, the zeroth-order spectral
    * feature. Integer sums (a 16-bit sample squares to ≤ 2³⁰; even
    * billions of samples fit a Long) ⇒ the only float ops are one
    * division + one subtraction per window: bit-replayable from the
    * source bytes in any engine, like the image features. */
  def audioEnergyVec(a: PcmAudio, windows: Int): Array[Double] = {
    require(windows > 0, s"windows must be positive: $windows")
    require(a.samples.length >= windows,
      s"${a.samples.length} samples shorter than $windows windows")
    var total = 0L
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i).toLong
      total += s * s
      i += 1
    }
    val mu = total.toDouble / a.samples.length
    val out = new Array[Double](windows)
    // Long bounds (ADVICE r19): (w+1)·n overflows Int at n > 2³¹/W —
    // a ~50-minute 48kHz stereo WAV at windows=8 — which made late
    // windows silently emit wrong features instead of failing.
    var w = 0
    while (w < windows) {
      val i0 = (w.toLong * a.samples.length / windows).toInt
      val i1 = ((w + 1).toLong * a.samples.length / windows).toInt
      var sum = 0L
      var j = i0
      while (j < i1) {
        val s = a.samples(j).toLong
        sum += s * s
        j += 1
      }
      out(w) = sum.toDouble / (i1 - i0) - mu
      w += 1
    }
    out
  }

  /** Decode + energy-contour embedding, per-partition (the
    * [[embedMedia]] shape for the audio modality): each payload
    * becomes an `e: array<double>` row the similarity/dedup
    * operators consume unchanged. Undecodable payloads — and
    * payloads with fewer samples than windows — get the dead-letter
    * row. */
  def embedAudio(media: Dataset[Media],
      windows: Int): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        WavCodec.decode(m.bytes) match {
          case Some(a) if a.samples.length >= windows =>
            MediaEmbedding(m.media_id, decoded = true,
              audioEnergyVec(a, windows))
          case _ =>
            MediaEmbedding(m.media_id, decoded = false,
              Array.empty[Double])
        }
      }
    }
  }

  /** REAL video decode + per-frame exact luma statistics (r20 —
    * [[Y4mCodec]], the [[decodeStats]]/[[audioStats]] sibling for the
    * THIRD modality): one row per TRUE container frame, replacing the
    * byte-window approximation [[sampleFrames]] documents. Integer
    * arithmetic only, so every column replays from the source bytes
    * in any engine. Undecodable payloads yield one dead-letter row
    * (decoded = false, frame_idx 0, zero stats). */
  def videoFrameStats(media: Dataset[Media]): Dataset[FrameStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        Y4mCodec.decode(m.bytes) match {
          case Some(v) =>
            v.frames.iterator.zipWithIndex.map { case (f, idx) =>
              val (sum, mn, mx) = Y4mCodec.lumaStats(f)
              FrameStats(m.media_id, idx, decoded = true, v.width,
                v.height, f.y.length, sum, mn, mx)
            }
          case None =>
            Iterator.single(FrameStats(m.media_id, 0, decoded = false,
              0, 0, 0, 0L, 0, 0))
        }
      }
    }
  }

  /** Decode + per-frame grid-feature embedding (r20 — the
    * [[embedMedia]] shape at FRAME granularity, feeding temporal
    * near-dup detection): each frame's luma plane goes through the
    * SAME [[gridFeatureVec]] kernel the image tier uses (a frame is a
    * Raster), so per-frame vectors flow into the existing
    * similarity/dedup operators keyed by (media_id, frame_idx).
    * Undecodable payloads — and frames smaller than the grid — get
    * one dead-letter row. */
  def embedVideoFrames(media: Dataset[Media], gw: Int,
      gh: Int): Dataset[FrameEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        Y4mCodec.decode(m.bytes) match {
          case Some(v) if v.width >= gw && v.height >= gh =>
            v.frames.iterator.zipWithIndex.map { case (f, idx) =>
              FrameEmbedding(m.media_id, idx, decoded = true,
                gridFeatureVec(Raster(v.width, v.height, 1, f.y), gw, gh))
            }
          case _ =>
            Iterator.single(FrameEmbedding(m.media_id, 0,
              decoded = false, Array.empty[Double]))
        }
      }
    }
  }

  /** Metadata-only resize: rescales the declared dimensions; the payload
    * stays opaque (a real build re-encodes in the decode step). */
  def resizeMeta(media: Dataset[Media], maxSide: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val side = math.max(m.width, m.height)
      if (side <= maxSide || side == 0) m
      else {
        val scale = maxSide.toDouble / side
        m.copy(width = math.max(1, (m.width * scale).toInt),
          height = math.max(1, (m.height * scale).toInt))
      }
    }
  }
}
