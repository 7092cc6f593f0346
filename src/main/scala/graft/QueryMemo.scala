package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for expensive intermediates shared by SEVERAL
  * queries of one session (e.g. the mined near-dup pair graph, consumed
  * by both cluster assignment and canonical-doc selection).
  *
  * [[CacheScope]] deliberately cannot express this: its contract is
  * release-after-every-query, which is right for intra-query persists
  * but forces cross-query consumers to re-mine from scratch. A memoized
  * frame is materialized ONCE per (application, key) as its own lazy
  * `localCheckpoint` — self-contained blocks, so later queries can read
  * it after CacheScope has released the plans that built it — and lives
  * until [[clear]] or session end. Only small derived artifacts belong
  * here (pair graphs, component maps: O(docs) rows of ids, never
  * documents), so pinning them for the session is cheap at any scale.
  */
object QueryMemo {
  private val memo =
    scala.collection.mutable.Map.empty[(String, String), DataFrame]

  /** The frame for `key`, building + materializing it on first use.
    * Keyed per SESSION (appId + session identity), not per context: a
    * stopped session's stale RDDs can never be served to a new one,
    * and two sessions sharing one context (e.g. a plain and an
    * extensions-enabled test session) never exchange frames whose
    * plans are bound to the other's analyzer. Production mains hold
    * one session, so they share maximally. */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.synchronized {
      val sessionKey = spark.sparkContext.applicationId + "#" +
        System.identityHashCode(spark)
      memo.getOrElseUpdate((sessionKey, key), {
        val chk = build.localCheckpoint(eager = false)
        chk.count()
        chk
      })
    }

  /** Drop every memoized frame and free its checkpoint blocks
    * (checkpoint data lives on the materialized RDD, not in the
    * CacheManager — release through the LogicalRDD leaf). */
  def clear(): Unit = memo.synchronized {
    memo.values.foreach { df =>
      df.queryExecution.analyzed match {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }
    memo.clear()
  }
}
