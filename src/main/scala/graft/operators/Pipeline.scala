package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Reusable event-pipeline operators — the library surface a consumer
  * of the reference would switch to. Each is a pure DataFrame
  * transformation; the `graft.queries.Events` entries are thin
  * instantiations of these over the test tables.
  */
object Routing {
  /** Regex route fanout (filter/filter.go:63-99): broadcast the route
    * table, match with the compiled-pattern-cached RegexMatch — the
    * event side never shuffles; events matching several routes fan out
    * to all of them. Routes must carry (stream, event_regex). */
  def fanout(events: DataFrame, routes: DataFrame, eventTypeCol: Column): DataFrame =
    events.join(broadcast(routes),
      graft.functions.RegexMatch.column(eventTypeCol, col("event_regex")))
      .drop("event_regex")

  /** Device-regex layer (filter_factory.go:129-167): empty or ".*"
    * means match-all. Per filter/filter.go:86 the device regex matches
    * the SOURCE or the DEST with its "event:" scheme stripped
    * (TrimPrefix) — either side passing admits the event. Routes carry
    * (stream, event_regex, device_regex). */
  def fanoutWithDevice(events: DataFrame, routes: DataFrame,
      eventTypeCol: Column, sourceCol: Column, destCol: Column): DataFrame = {
    val strippedDest = regexp_replace(destCol, "^event:", "")
    events.join(broadcast(routes),
      graft.functions.RegexMatch.column(eventTypeCol, col("event_regex")) &&
        (col("device_regex") === "" || col("device_regex") === ".*" ||
          graft.functions.RegexMatch.column(sourceCol, col("device_regex")) ||
          graft.functions.RegexMatch.column(strippedDest, col("device_regex"))))
      .drop("event_regex", "device_regex")
  }
}

object Dedup {
  /** Keep-first per key (delivery-retry suppression): row_number = 1
    * ordered by `order`. Shuffles only the key columns' hash — callers
    * should key on a fingerprint, not a payload. */
  def keepFirst(df: DataFrame, key: Seq[Column], order: Column): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

object Sessionize {
  /** Assemble per-session records by merging online/offline event
    * pairs (tags.go:53 EventMergeError, :57 NoSessionStartError): per
    * user in (ts, order) arrival order, each offline (disconnect)
    * event attempts to merge with the most recent PRECEDING online
    * event. The attempt ladder, in the order a merge actually fails:
    *   - no preceding online in history → `no_session_start`;
    *   - either side's payload fails a REAL JSON parse (the payloads
    *     are actually parsed — corruption synthesized upstream, the
    *     failure is not) → `error_merging_event`;
    *   - otherwise → `merged`, with the session duration.
    * Emits one row per merge attempt (offline event): user, online /
    * offline event ids, dur_s (null unless merged), status. Three
    * ignore-nulls `last` windows carry the online side's id/second/
    * session_id — all on ONE hash exchange of the user column. The
    * payload JSON is REALLY parsed (`$.session_id`; corruption is
    * synthesized upstream, the parse failure is not) but BEFORE the
    * window, map-side: only the extracted id rides the window sort and
    * its state, never the payload string — at 100× with real payloads
    * the sort would otherwise carry payload bytes per row
    * (PlanAuditSpec pins the window input width). */
  def mergeEvents(df: DataFrame, user: Column, ts: Column, order: Column,
      isOnline: Column, isOffline: Column, payload: Column): DataFrame = {
    // the projection below is the narrow-before-the-shuffle step:
    // every caller expression (incl. the payload parse) is evaluated
    // map-side, and the window operates on the 7 narrow columns only
    val narrow = df
      .withColumn("sec", unix_timestamp(ts))
      .withColumn("__on", isOnline)
      .withColumn("__sid", get_json_object(payload, "$.session_id"))
      .select(user.as("__user"), ts.as("__ts"), order.as("__ord"),
        isOffline.as("__off"), col("sec"), col("__on"), col("__sid"))
    val w = Window.partitionBy(col("__user"))
      .orderBy(col("__ts"), col("__ord"))
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    narrow
      .withColumn("on_event_id",
        last(when(col("__on"), col("__ord")), ignoreNulls = true).over(prev))
      .withColumn("__on_sec",
        last(when(col("__on"), col("sec")), ignoreNulls = true).over(prev))
      // struct-wrapped so ignoreNulls keys on "was there an online
      // event", not "did its payload parse": an online event with a
      // corrupt payload (null __sid inside a NON-null struct) must
      // still be the merge partner — and then fail the merge — not be
      // skipped in favor of an older parseable one
      .withColumn("__on_sid",
        last(when(col("__on"), struct(col("__sid").as("v"))),
          ignoreNulls = true).over(prev).getField("v"))
      .filter(col("__off"))
      .withColumn("status",
        when(col("on_event_id").isNull, "no_session_start")
          .when(col("__sid").isNull || col("__on_sid").isNull,
            "error_merging_event")
          .otherwise("merged"))
      .withColumn("dur_s",
        when(col("status") === "merged", col("sec") - col("__on_sec")))
      .withColumn("off_event_id", col("__ord"))
      .select(col("__user").as("user_id"), col("on_event_id"),
        col("off_event_id"), col("dur_s"), col("status"))
  }

  /** Gap-based session index per user (online/offline semantics):
    * lag + cumulative sum over ONE shuffle on the user column. Adds
    * `session_idx` (1-based per user) and `sec` (epoch seconds). */
  def gapSessions(df: DataFrame, user: Column, ts: Column, order: Column,
      gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(user).orderBy(order)
    df.withColumn("sec", unix_timestamp(ts))
      .withColumn("__gap", col("sec") - lag("sec", 1).over(byUser))
      .withColumn("session_idx",
        sum(when(col("__gap").isNull || col("__gap") > gapSec, 1L)
          .otherwise(0L))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__gap")
  }
}

object Batching {
  /** Deterministic batch assignment (queue.go:144-216): row_number per
    * (stream, bucket) ÷ batchSize. The bucket column bounds each window
    * partition — batching per stream alone would funnel a stream's
    * whole history through one reducer. */
  def assign(df: DataFrame, stream: Column, bucket: Column, order: Column,
      batchSize: Int): DataFrame = {
    val w = Window.partitionBy(stream, bucket).orderBy(order)
    df.withColumn("batch_id",
      floor((row_number().over(w) - 1) / batchSize).cast(LongType))
  }

  /** Time-OR-size flush (queue.go:144-216): processItems flushes the
    * moment the batch reaches BatchSize, and the BatchTimeLimitSeconds
    * ticker flushes whatever has accumulated when arrivals pause — so a
    * batch closes at `batchSize` OR when the gap to the next arrival
    * exceeds `timeLimitSec`. FIDELITY (ADVICE r12): the reference's
    * ticker is free-running and periodic — reset only after it fires,
    * never on arrivals or size flushes — so under a steady sub-limit
    * trickle (batchSize 10, limit 600 s, one event each 500 s) it also
    * flushes ~1-event batches each tick where this gap model
    * accumulates 10. The gap replay is a deterministic APPROXIMATION,
    * exact when arrivals are dense (size flushes dominate) or fully
    * idle; modeling the periodic phase would need wall-clock alignment
    * no deterministic replay can commit to. Decomposes into two
    * prefix-sum windows:
    * gap-boundaries open a new "flush session" (exactly Sessionize's
    * cumulative condition — a time flush always resets the size count),
    * and fixed-size sub-batches partition each session. `batch_id` is
    * 1-based dense per (stream, bucket) in arrival order; `sec` (epoch
    * seconds of `ts`) is kept for span accounting. Three window passes,
    * ONE hash exchange: pass 2 refines pass 1's keys (AQE keeps the
    * partitioning; only a re-sort), pass 3 reuses pass 1's keys. The
    * bucket column bounds every partition, as in [[assign]]. */
  def assignTimeOrSize(df: DataFrame, stream: Column, bucket: Column,
      ts: Column, order: Column, batchSize: Int, timeLimitSec: Long): DataFrame = {
    val w = Window.partitionBy(stream, bucket).orderBy(order)
    val ws = Window.partitionBy(stream, bucket, col("__sess")).orderBy(order)
    val wb = Window.partitionBy(stream, bucket)
      .orderBy(col("__sess"), col("__sub"))
    df.withColumn("sec", unix_timestamp(ts))
      .withColumn("__gap", col("sec") - lag("sec", 1).over(w))
      .withColumn("__sess",
        sum(when(col("__gap").isNull || col("__gap") > timeLimitSec, 1L)
          .otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__sub",
        floor((row_number().over(ws) - 1) / batchSize).cast(LongType))
      .withColumn("batch_id", dense_rank().over(wb).cast(LongType))
      .drop("__gap", "__sess", "__sub")
  }

  /** EXACT free-running-ticker flush (queue.go:155-173): `Start`
    * creates the BatchTimeLimitSeconds ticker once per queue and
    * re-creates it only after it fires — never on arrivals or size
    * flushes — so ticks are strictly periodic at the queue's start
    * phase: t0 + k·tickSec. A pending batch therefore never survives a
    * tick boundary (the tick flushes whatever accumulated, an empty
    * flush is a no-op), and within one tick window only size flushes
    * occur. That collapses the whole state machine into arithmetic:
    * tick window = floor((sec − t0)/tickSec), sub-batch = row_number
    * within the window ÷ batchSize. This is the faithful model of the
    * regime the gap-based [[assignTimeOrSize]] approximates (ADVICE
    * r12): under a steady sub-limit trickle the ticker flushes ~1-event
    * batches every tick, and so does this operator. Deterministic
    * anchors: t0 = the partition's first arrival second (the queue
    * start instant is not in the data; first-arrival phase is the one
    * deterministic choice, and a replay disagrees with the wall ticker
    * only by the constant start→first-arrival offset); an event landing
    * exactly ON a tick second joins the NEW window (Go's select makes
    * the race nondeterministic — the replay must pick a side, and
    * floor() picks tick-first). Adds `batch_id` (1-based dense per
    * (stream, bucket) in arrival order), `tick_close_s` (the window-end
    * tick that would flush this event's batch if size doesn't), and
    * `sec`. Three windows, ONE hash exchange: the unordered min shares
    * the (stream, bucket) keys, the row_number refines them with
    * `__tick` (subset rule), the dense_rank reuses them with a re-sort.
    * The bucket column bounds every partition, as in [[assign]]. */
  def assignPeriodic(df: DataFrame, stream: Column, bucket: Column,
      ts: Column, order: Column, batchSize: Int, tickSec: Long): DataFrame = {
    val part = Window.partitionBy(stream, bucket)
    df.withColumn("sec", unix_timestamp(ts))
      .withColumn("__t0", min(col("sec")).over(part))
      .withColumn("__tick",
        floor((col("sec") - col("__t0")) / tickSec).cast(LongType))
      .withColumn("__sub",
        floor((row_number().over(Window.partitionBy(stream, bucket,
          col("__tick")).orderBy(order)) - 1) / batchSize).cast(LongType))
      .withColumn("batch_id",
        dense_rank().over(part.orderBy(col("__tick"), col("__sub")))
          .cast(LongType))
      .withColumn("tick_close_s",
        col("__t0") + (col("__tick") + 1L) * tickSec)
      .drop("__t0", "__tick", "__sub")
  }
}
