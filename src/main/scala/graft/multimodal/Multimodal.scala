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

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition so one task holds one
  * codec context (the real-world decode libraries are heavyweight to
  * initialize — the per-partition shape is the part that matters at
  * 100 TB, where a row-at-a-time UDF would re-init per record).
  *
  * The decode kernels themselves are STUBS — this container has no
  * image/audio codecs — replaced by a deterministic fake that hashes the
  * payload. The Spark-side plumbing (schema, encoders, partitioning,
  * per-partition batching, flatMap fan-out) is real and tested.
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
