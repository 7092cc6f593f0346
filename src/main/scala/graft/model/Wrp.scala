package graft.model

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** WRP message model — the public wrp-go v3 fields the reference touches
  * (internal/event/request_handler.go, filter/filter.go). Typed Dataset
  * row for the streaming path and the from_json schema for parsing.
  *
  * msg_type 4 = SimpleEvent (the only type the reference accepts);
  * dest carries the "event:<type>/..." scheme; source the device id
  * ("mac:<id>"). partner_ids/metadata are the open-ended WRP extension
  * points.
  */
case class Wrp(
    msg_type: Int,
    source: String,
    dest: String,
    transaction_uuid: String,
    content_type: String,
    partner_ids: Seq[String],
    metadata: Map[String, String],
    payload: String,
    session_id: String,
    qos: Int)

object Wrp {
  /** Schema for from_json on raw WRP documents — derived from the case
    * class so the typed and untyped paths can never drift. */
  val schema: StructType = Encoders.product[Wrp].schema
}
