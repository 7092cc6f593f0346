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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (mmFeatures _),
    "mm_frames" -> (mmFrames _))

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
        |  FROM documents) t""".stripMargin)
}
