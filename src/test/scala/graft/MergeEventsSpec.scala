package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2a #27c: Sessionize.mergeEvents — the online/offline merge
  * ladder on a hand-built corpus where every branch is reachable:
  * no-session-start precedence over corruption, either-side parse
  * failure, duration arithmetic, and most-recent-online selection. */
class MergeEventsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("merge ladder: no_session_start > error_merging_event > merged") {
    import spark.implicits._
    // (user, ts, id, kind, payload) — payload null-parse simulated by
    // a truncated JSON string, as Synthetics.sessionPayload does
    def pl(id: Long, corrupt: Boolean): String =
      if (corrupt) s"""{"session_id": "s-$id""" else s"""{"session_id": "s-$id"}"""
    val rows = Seq(
      // u1: offline before any online -> no_session_start, even though
      // its payload is ALSO corrupt (precedence)
      (1L, ts("2024-01-01 10:00:00"), 10L, "off", pl(10L, corrupt = true)),
      // u1: online at 11:00, a NEWER online at 12:00, offline at 12:30
      // -> merges with the 12:00 one (most recent), dur 1800
      (1L, ts("2024-01-01 11:00:00"), 11L, "on", pl(11L, corrupt = false)),
      (1L, ts("2024-01-01 12:00:00"), 12L, "on", pl(12L, corrupt = false)),
      (1L, ts("2024-01-01 12:30:00"), 13L, "off", pl(13L, corrupt = false)),
      // u2: clean online, corrupt OFFLINE payload -> error_merging_event
      (2L, ts("2024-01-01 09:00:00"), 20L, "on", pl(20L, corrupt = false)),
      (2L, ts("2024-01-01 09:10:00"), 21L, "off", pl(21L, corrupt = true)),
      // u3: corrupt ONLINE payload, clean offline -> error_merging_event
      (3L, ts("2024-01-01 09:00:00"), 30L, "on", pl(30L, corrupt = true)),
      (3L, ts("2024-01-01 09:05:00"), 31L, "off", pl(31L, corrupt = false))
    ).toDF("user_id", "ts", "event_id", "kind", "payload")

    val got = graft.operators.Sessionize.mergeEvents(rows,
        col("user_id"), col("ts"), col("event_id"),
        col("kind") === "on", col("kind") === "off", col("payload"))
      .as[(Long, Option[Long], Long, Option[Long], String)]
      .collect().toSet

    assert(got == Set(
      (1L, None, 10L, None, "no_session_start"),
      (1L, Some(12L), 13L, Some(1800L), "merged"),
      (2L, Some(20L), 21L, None, "error_merging_event"),
      (3L, Some(30L), 31L, None, "error_merging_event")))
  }
}
