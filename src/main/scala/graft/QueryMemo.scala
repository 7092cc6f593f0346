package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for expensive intermediates shared by SEVERAL
  * queries of one session (e.g. the mined near-dup pair graph, consumed
  * by pair listing, victim removal, clustering and canonical selection).
  *
  * [[CacheScope]] deliberately cannot express this: its contract is
  * release-after-every-query, which is right for intra-query persists
  * but forces cross-query consumers to re-mine from scratch. A memoized
  * frame is materialized ONCE per (session, key) as its own lazy
  * `localCheckpoint` — self-contained blocks, so later queries can read
  * it after CacheScope has released the plans that built it — and lives
  * until [[clear]] or session end. Only small derived artifacts belong
  * here (pair graphs, component maps: O(docs) rows of ids, never
  * documents), so pinning them for the session is cheap at any scale.
  *
  * Scope of the localCheckpoint choice: it is right for single-JVM
  * sessions (local mode — this repo's runtime), where losing an
  * executor means losing the JVM. On a multi-executor cluster,
  * localCheckpoint blocks are unreplicated and lineage-free: a lost
  * executor would poison the entry until [[clear]]. Cluster deployments
  * should persist shared artifacts as TABLES instead (e.g.
  * `Similarity.ivfIndex` written to parquet) — the memo is a
  * session-convenience, not a durability mechanism.
  */
object QueryMemo {
  // value = the checkpointed frame + the ids of the RDDs its build
  // newly persisted (captured from getPersistentRDDs around the
  // materialization), so clear() can release blocks WITHOUT assuming
  // any particular analyzed-plan shape (LogicalRDD today; anything a
  // future Spark wraps the checkpoint in tomorrow).
  private val memo =
    scala.collection.mutable.Map.empty[(Long, String), (DataFrame, Set[Int])]
  // identity-keyed (SparkSession does not override equals) and weak, so
  // a stopped session's entry key cannot pin the session object; ids
  // are assigned, never hashed — two live sessions can never collide
  private val sessionIds = new java.util.WeakHashMap[SparkSession, java.lang.Long]()
  private var nextSessionId = 0L
  private val off = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = java.lang.Boolean.FALSE
  }
  // key -> the caller label (set by Bench around each query) that paid
  // the one-time build: pass-major bench accounting charges a shared
  // artifact to its first consumer, and the record makes that explicit
  // so cross-round per-query comparison cannot misattribute it.
  private val buildLog = scala.collection.mutable.Map.empty[String, String]
  @volatile private var label: String = _

  /** Label subsequent builds on any thread (null = unlabeled). */
  def setLabel(l: String): Unit = label = l

  /** Which label paid each memo build since the last [[clear]],
    * keyed by the memo key's short name (prefix before the first ':'). */
  def buildCharges: Map[String, String] = memo.synchronized {
    buildLog.map { case (k, v) => k.takeWhile(_ != ':') -> v }.toMap
  }

  /** Run `body` with memoization OFF on this thread: cached() returns
    * the freshly-built frame with its full logical plan, materializing
    * nothing. Plan audits (Explain, PlanAuditSpec) use this — a
    * memoized LogicalRDD leaf would hide the mining subplan they exist
    * to inspect. */
  def disabled[T](body: => T): T = {
    val prev = off.get()
    off.set(java.lang.Boolean.TRUE)
    try body finally off.set(prev)
  }

  /** The frame for `key`, building + materializing it on first use.
    * Keyed per SESSION: a stopped session's stale RDDs can never be
    * served to a new one, and two sessions sharing one context (e.g. a
    * plain and an extensions-enabled test session) never exchange
    * frames whose plans are bound to the other's analyzer.
    *
    * The build runs under the memo's global lock: callers here are the
    * sequential mains (Verify/Bench/probes), so a convoy cannot form; a
    * concurrent query server would want per-key futures instead. */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    if (off.get()) build
    else memo.synchronized {
      val sid = {
        val existing = sessionIds.get(spark)
        if (existing != null) existing.longValue()
        else {
          nextSessionId += 1
          sessionIds.put(spark, java.lang.Long.valueOf(nextSessionId))
          nextSessionId
        }
      }
      memo.getOrElseUpdate((sid, key), {
        if (label != null) buildLog(key) = label
        val sc = spark.sparkContext
        // NOTE: the before/after id diff attributes EVERY RDD persisted
        // during the build window to this entry — sound only because
        // builds run under the memo's global lock AND the callers are
        // sequential mains (no concurrent thread persists during the
        // window). A concurrent query server would need to filter the
        // diff to RDDs reachable from `chk` instead.
        val before = sc.getPersistentRDDs.keySet
        val chk = build.localCheckpoint(eager = false)
        chk.count()
        (chk, sc.getPersistentRDDs.keySet.diff(before).toSet)
      })._1
    }

  /** Drop every memoized frame and free its checkpoint blocks
    * (checkpoint data lives on the materialized RDD, not in the
    * CacheManager — release through the LogicalRDD leaf). Bench calls
    * this between passes so each pass pays the one-time mining cost
    * exactly once — honest, reproducible timings; long-lived JVMs call
    * it when a corpus is retired. */
  def clear(): Unit = memo.synchronized {
    memo.values.foreach { case (df, persistedIds) =>
      df.queryExecution.analyzed match {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.unpersist(blocking = false)
        case _ => ()
      }
      // Belt and braces for plan shapes a future Spark might wrap the
      // checkpoint in: release by the RDD ids the build persisted, so
      // blocks cannot leak for the session lifetime even if the
      // LogicalRDD match above stops firing.
      val sc = df.sparkSession.sparkContext
      val live = sc.getPersistentRDDs
      persistedIds.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
    }
    memo.clear()
    buildLog.clear()
  }
}
