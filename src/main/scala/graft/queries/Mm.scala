package graft.queries

import graft.Tables
import graft.multimodal.{Media, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal pipeline as a verifiable query (SURVEY.md §2c #47): the
  * documents table plays the media store (payload = UTF-8 bytes of the
  * text), flowing through the typed Dataset → per-partition decode →
  * feature row path. The surfaced columns are byte-level facts the
  * oracle can recompute, so the whole mapPartitions plumbing is
  * oracle-verified even though the decode kernel itself is the stub. */
object Mm {

  def mmFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, lang, text) =>
        Media(id, if (lang == "en") "image" else "audio",
          text.getBytes("UTF-8"), 640, 480, 16000)
      }
    Multimodal.extractFeatures(media, dim = 16)
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        size(col("features")).as("n_feat"))
  }

  /** #47b Frame sampling: every 256-byte window of the payload becomes
    * one frame row (per-partition flatMap fan-out — the real build reads
    * container frame offsets; the window arithmetic IS the verifiable
    * plumbing). The checksum column stays internal: it is the stub
    * kernel's, not reproducible cross-engine; the fan-out shape is. */
  def mmFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, lang, text) =>
        Media(id, if (lang == "en") "image" else "audio",
          text.getBytes("UTF-8"), 640, 480, 16000)
      }
    Multimodal.sampleFrames(media, strideBytes = 256)
      .toDF()
      .select(col("media_id"), col("frame_idx"),
        col("offset").as("frame_off"))
  }

  /** Binary P5 payload: real PGM header + the first w·h text bytes as
    * pixels (zero-padded) — a REAL image file the zero-dependency
    * [[graft.multimodal.PnmCodec]] parses, built from bytes the
    * oracle can also see (the corpus is ASCII, so ord(char) IS the
    * byte). */
  private def pgmPayload(text: String, w: Int, h: Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](w * h)
    val tb = text.getBytes("US-ASCII")
    var i = 0
    while (i < body.length && i < tb.length) { body(i) = tb(i); i += 1 }
    header ++ body
  }

  private def pgmMedia(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        Media(id, "image", pgmPayload(text, 16, 8), 16, 8, 0)
      }
  }

  /** #47c REAL image decode (r18): every doc becomes a binary PGM
    * payload, [[graft.multimodal.PnmCodec.decode]] parses it for
    * real, and the surfaced columns are exact pixel statistics the
    * oracle recomputes from the same source bytes — the decode slot
    * itself is now oracle-verified, not just the plumbing around a
    * stub. */
  def mmDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeStats(pgmMedia(s, d)).toDF()
      .withColumn("px_mean",
        col("px_sum").cast("double") / col("n_pixels"))

  /** #47d REAL pixel resize (r18): decode + nearest-neighbor 16×8 →
    * 4×4 (integer source mapping: src = floor(dst·srcDim/dstDim), so
    * the 16 sampled positions are fixed constants the oracle reads
    * directly). */
  def mmResize(s: SparkSession, d: String): DataFrame =
    Multimodal.resizePixels(pgmMedia(s, d), 4, 4).toDF()

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (mmFeatures _),
    "mm_frames" -> (mmFrames _),
    "mm_decode" -> (mmDecode _),
    "mm_resize" -> (mmResize _))

  val oracles: Map[String, String] = Map(
    "mm_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN lang = 'en' THEN 'image' ELSE 'audio' END AS kind,
        |  octet_length(encode(text)) AS n_bytes, 16 AS n_feat
        |FROM documents""".stripMargin,
    "mm_frames" ->
      """SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
        |  CAST(f * 256 AS INT) AS frame_off
        |FROM (
        |  SELECT doc_id, unnest(range(0,
        |    greatest(octet_length(encode(text)) // 256, 1))) AS f
        |  FROM documents) t""".stripMargin,
    // pixels = the first 128 ASCII bytes zero-padded; ord(char) is the
    // byte because the corpus is ASCII (checked: octet_length == len
    // corpus-wide); the mean divides the exact integer sum like Spark
    "mm_decode" ->
      """WITH b AS (
        |  SELECT doc_id, list_transform(range(1, 129), i ->
        |    CASE WHEN i <= len(text)
        |         THEN ord(substr(text, CAST(i AS INTEGER), 1))
        |         ELSE 0 END) AS px
        |  FROM documents)
        |SELECT doc_id AS media_id, TRUE AS decoded, 16 AS width,
        |  8 AS height, 1 AS channels, 128 AS n_pixels,
        |  CAST(list_sum(px) AS BIGINT) AS px_sum,
        |  CAST(list_min(px) AS INTEGER) AS px_min,
        |  CAST(list_max(px) AS INTEGER) AS px_max,
        |  CAST(list_sum(px) AS DOUBLE) / 128 AS px_mean
        |FROM b""".stripMargin,
    // nearest-neighbor 16x8 -> 4x4: src index = 32y + 4x (0-based), so
    // the sampled 1-based text positions are the fixed list below
    "mm_resize" ->
      """SELECT doc_id AS media_id, 4 AS width, 4 AS height,
        |  array_to_string(list_transform(
        |    [1,5,9,13,33,37,41,45,65,69,73,77,97,101,105,109], i ->
        |    CAST(CASE WHEN i <= len(text)
        |              THEN ord(substr(text, CAST(i AS INTEGER), 1))
        |              ELSE 0 END AS VARCHAR)), ',') AS pixels
        |FROM documents""".stripMargin)
}
