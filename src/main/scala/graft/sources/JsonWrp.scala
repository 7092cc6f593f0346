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
}
