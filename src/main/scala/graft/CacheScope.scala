package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic lifecycle for intra-query persists.
  *
  * The near-dup family (graft.queries.Docs) persists shared subtrees
  * (posting lists, signatures) that feed multiple branches of ONE query
  * plan. Those caches must not accumulate for the lifetime of the
  * session: a 100 TB pipeline iterating corpora would pin executor
  * storage until eviction pressure. Query builders register each persist
  * here; the driving loop (Verify / Bench / tests) calls [[releaseAll]]
  * after the consuming action, returning storage deterministically
  * instead of relying on CacheManager luck.
  */
object CacheScope {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist (MEMORY_AND_DISK) and track for the next releaseAll. */
  def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(p)
    p
  }

  /** Track an ALREADY-persisted DataFrame (e.g. one materialized inside
    * an iterative loop) for the next releaseAll without re-persisting —
    * a second persist() would only log an already-cached warning.
    *
    * WARNING for localCheckpoint-backed frames: their lineage is
    * truncated, so after [[releaseAll]] the frame CANNOT be read again
    * (Spark throws instead of recomputing, unlike a plain persist).
    * Track one only when every read happens before the release — the
    * consume-then-release contract Verify/Bench/tests follow. */
  def track(df: DataFrame): DataFrame = {
    tracked.add(df)
    df
  }

  /** Unpersist every tracked DataFrame (non-blocking) and clear the
    * registry. Persisted plans that have not yet run simply recompute.
    * localCheckpoint results store their data on the materialized RDD
    * (not in the CacheManager, where unpersist looks), so those are
    * released through the LogicalRDD leaf instead of waiting for
    * ContextCleaner GC — with the one sharp edge that a checkpoint's
    * lineage is truncated: a checkpoint-backed result CANNOT be read
    * after its release (Spark throws rather than recomputing). Call
    * releaseAll only after the consuming action, which is the
    * Verify/Bench/test contract everywhere in this repo. */
  def releaseAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df.queryExecution.analyzed match {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.unpersist(blocking = false)
        case _ => ()
      }
      df = tracked.poll()
    }
  }
}
