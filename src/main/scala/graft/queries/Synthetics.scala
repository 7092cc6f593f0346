package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic stand-ins for runtime signals the synthetic parquet
  * has no column for (empty WRP fields, transport errors, not-an-event
  * dests). Several queries AND their DuckDB oracle twins share these
  * reason-ladder predicates; each lives here exactly once so a query
  * and its oracle cannot drift apart. The oracle SQL mirrors them as
  * literal `event_id % k` expressions — changing a modulus here means
  * changing the matching oracle string in the same commit.
  */
object Synthetics {

  /** fixWrp: message arrived with an empty content type
    * (reference internal/event/request_handler.go:141-150). */
  val emptyContentType: Column = pmod(col("event_id"), lit(5)) === 0

  /** fixWrp: message arrived without a transaction uuid
    * (reference internal/event/request_handler.go:152-163). */
  val emptyUuid: Column = pmod(col("event_id"), lit(3)) === 0

  /** dest outside the "event:" scheme
    * (reference internal/metrics/tags.go NotAnEvent). */
  val notAnEvent: Column = pmod(col("event_id"), lit(13)) === 0

  /** per-record failure inside an accepted Kinesis PutRecords batch
    * (reference internal/metrics/tags.go:56). */
  val kinesisRecordFailed: Column = pmod(col("event_id"), lit(23)) === 0

  /** transport retry ladder: %10 exhausts all 3 retries and fails over
    * to the alt stream; %7 / %3 succeed after 2 / 1 transient retries
    * (reference filter/filter.go:30 deliveryRetries). */
  val failedOver: Column = pmod(col("event_id"), lit(10)) === 0

  /** transport failed reading the request body — precedes ALL
    * validation in the reference's ladder (request_handler.go:90-95;
    * tags.go:39 EventReadRequestError). */
  val readRequestError: Column = pmod(col("event_id"), lit(103)) === 0

  /** any 400-class validation reject on a successfully-READ body
    * (request_handler.go:97-131; tags.go:40 EventBadRequest): empty
    * payload (%101), undecodable (%89), msg_type != 4 (%97), invalid
    * UTF-8 (%79) — the same four moduli wrp_validate's ladder
    * synthesizes its payload classes from. */
  def badRequest: Column = !readRequestError &&
    (pmod(col("event_id"), lit(101)) === 0 ||
      pmod(col("event_id"), lit(89)) === 0 ||
      pmod(col("event_id"), lit(97)) === 0 ||
      pmod(col("event_id"), lit(79)) === 0)

  /** disconnect event arrived without its reason payload
    * (reference internal/metrics/tags.go:49 NoDisconnectPayload). */
  val missingDisconnectPayload: Column = pmod(col("event_id"), lit(17)) === 0

  /** The corruption subset for session payloads — kept as the %19
    * arithmetic the ORACLE replays; the queries themselves now count
    * merge errors from the ACTUAL parse of [[sessionPayload]]
    * (reference internal/metrics/tags.go:53 EventMergeError). */
  val mergeError: Column = pmod(col("event_id"), lit(19)) === 0

  /** The session-state payload a merge attempt actually parses:
    * well-formed JSON carrying the session id, TRUNCATED (unterminated
    * string, no closing brace) on the [[mergeError]] subset so a real
    * JSON parse fails — the corruption is synthesized, the failure is
    * not. */
  def sessionPayload: Column =
    when(mergeError,
      concat(lit("{\"session_id\": \"s-"), col("event_id")))
      .otherwise(concat(
        lit("{\"session_id\": \"s-"), col("event_id"), lit("\"}")))

  /** Real merge-failure flag: the offline (disconnect) merge attempt's
    * own payload fails to parse. Stateless, shared by the batch
    * evt_merge_errors and the streaming mergeErrorFlags so the twins
    * cannot drift; the session-aware attempt ladder (no_session_start
    * precedence, both-sides parse) lives in
    * [[graft.operators.Sessionize.mergeEvents]]. */
  def mergeFailed: Column = offlineEvent &&
    get_json_object(sessionPayload, "$.session_id").isNull

  /** The 13-label drop-reason vocabulary, in declaration order
    * (reference internal/event/metrics.go:47-63 — the error ladder a
    * transport DO failure is classified into; no_err is the non-drop
    * label and never reaches the DroppedMessage counter). */
  val dropReasons: Seq[String] = Seq(
    "unknown", "context_deadline_exceeded", "context_canceled",
    "address_error", "parse_address_error", "invalid_address",
    "dns_error", "host_not_found", "connection_closed", "op_error",
    "unknown_network_err", "update_request_url_failed",
    "connection_unexpectedly_closed_eof")

  /** Failed-over delivery whose alt-stream attempt ALSO fails — the
    * dispatcher's terminal drop (filter/stream_dispatcher.go:66-71
    * all-streams-failed → DroppedMessage with a reason label;
    * filter/metrics.go:22). A strict subset of [[failedOver]]: the
    * primary already exhausted its retries. */
  val deliveryDropped: Column = pmod(col("event_id"), lit(30)) === 0

  /** Deterministic reason classification for a dropped delivery:
    * (event_id / 30) mod 13 indexes [[dropReasons]] — uniform over the
    * vocabulary because dropped ids are exactly the multiples of 30.
    * The oracle replays the same floor-divide arithmetic (generated
    * from the same list, so the ladders cannot drift). */
  def dropReason: Column = {
    val idx = pmod(floor(col("event_id") / 30).cast("long"),
      lit(dropReasons.length))
    dropReasons.zipWithIndex.tail.foldLeft(
      when(idx === 0, dropReasons.head)) { case (acc, (r, i)) =>
      acc.when(idx === i, r)
    }
  }

  def retryCount: Column =
    when(failedOver, 3L)
      .when(pmod(col("event_id"), lit(7)) === 0, 2L)
      .when(pmod(col("event_id"), lit(3)) === 0, 1L)
      .otherwise(0L)

  /** Connection interface parsed from the props field — #13c's ladder;
    * NULL = the interface-used read fails. Shared by the batch
    * evt_merge_errors and its streaming twin. */
  def interfaceUsed: Column = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    when(pmod(k, lit(5)) === 0, "wifi")
      .when(pmod(k, lit(5)) === 1, "ethernet")
      .when(pmod(k, lit(5)) === 2, "moca")
      .when(pmod(k, lit(5)) === 3, "5g-modem")
      .otherwise(lit(null))
  }

  /** #13b's dest sub-type ladder (device state class embedded in the
    * synthesized dest path; %6=5 ⇒ an off-list class). */
  def destSubtype: Column =
    when(pmod(col("event_id"), lit(6)) === 0, "online")
      .when(pmod(col("event_id"), lit(6)) === 1, "offline")
      .when(pmod(col("event_id"), lit(6)) === 2, "operational")
      .when(pmod(col("event_id"), lit(6)) === 3, "manageable")
      .when(pmod(col("event_id"), lit(6)) === 4, "pending-reboot")
      .otherwise("mystery")

  /** #13b's offline (disconnect) sub-type. */
  val offlineEvent: Column = pmod(col("event_id"), lit(6)) === 1

  /** The disconnect reason ACTUALLY parsed from the synthesized payload
    * (corrupt on the missingDisconnectPayload subset) — NULL = missing. */
  def disconnectReason: Column =
    get_json_object(
      when(missingDisconnectPayload, lit("{}"))
        .otherwise(lit("""{"reason":"normal-disconnect"}""")),
      "$.reason")
}
