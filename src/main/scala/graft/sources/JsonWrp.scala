package graft.sources

import graft.model.Wrp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** JSON WRP source — the reference's other content type
  * (internal/event/request_handler.go decodes application/json bodies
  * with the same validation). from_json is PERMISSIVE: a malformed body
  * yields a null struct, which maps to the reference's 400-and-drop
  * path; callers wanting a dead-letter stream can invert the filter. */
object JsonWrp {

  /** Raw JSON lines → typed Dataset[Wrp], malformed rows dropped. */
  def decodeDataset(raw: DataFrame, jsonCol: String = "value"): Dataset[Wrp] = {
    import raw.sparkSession.implicits._
    raw.select(from_json(col(jsonCol), Wrp.schema).as("m"))
      .filter(col("m").isNotNull && col("m.msg_type").isNotNull)
      .select("m.*")
      .na.fill(0, Seq("qos"))
      .as[Wrp]
  }

  /** The rows decodeDataset dropped — the dead-letter side. Parses each
    * body once (a filter with two from_json calls would re-parse per
    * predicate evaluation). */
  def corruptRecords(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.withColumn("__m", from_json(col(jsonCol), Wrp.schema))
      .filter(col("__m").isNull || col("__m.msg_type").isNull)
      .drop("__m")

  /** Dead letters tagged with the reference's 400-reason ladder
    * (request_handler.go:95-131, same order as the wrp_validate query):
    * empty payload → decode/format error → bad msg_type → invalid
    * UTF-8 → valid. Returns every input row with a `reject_reason`
    * column ('valid' for rows decodeDataset keeps), so a pipeline can
    * count rejects by reason exactly like the reference's counters. */
  def classify(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.withColumn("__m", from_json(col(jsonCol), Wrp.schema))
      .withColumn("reject_reason",
        when(col(jsonCol).isNull || length(col(jsonCol)) === 0, "empty_payload")
          // PERMISSIVE from_json yields an all-null struct (not a null
          // one) for malformed bodies — get_json_object('$') is the
          // actual does-it-parse probe
          .when(col("__m").isNull ||
            get_json_object(col(jsonCol), "$").isNull, "invalid_format")
          .when(col("__m.msg_type").isNull || col("__m.msg_type") =!= 4,
            "invalid_msg_type")
          .when(!is_valid_utf8(col(jsonCol)), "invalid_utf8")
          .otherwise("valid"))
      .drop("__m")
}
