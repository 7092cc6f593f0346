package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** QueryMemo contract: build-once per (session, key), checkpoint-backed
  * results that survive CacheScope releases, a disabled scope that
  * preserves plans for audits, and clear() restoring a cold state. */
class QueryMemoSpec extends AnyFunSuite {

  lazy val spark = SparkTest.spark

  test("cached builds once per key and returns the identical frame") {
    var builds = 0
    def build() = { builds += 1; spark.range(10).toDF("id") }
    val key = s"memo-spec-once-${System.nanoTime()}"
    val a = QueryMemo.cached(spark, key)(build())
    val b = QueryMemo.cached(spark, key)(build())
    assert(builds == 1, "second cached() call must not rebuild")
    assert(a eq b, "must return the memoized frame itself")
    assert(b.count() == 10)
  }

  test("memoized frames are self-contained: readable after CacheScope.releaseAll") {
    val key = s"memo-spec-release-${System.nanoTime()}"
    val f = QueryMemo.cached(spark, key)(
      CacheScope.persistTracked(spark.range(100).toDF("id"))
        .filter(col("id") % 2 === 0))
    assert(f.count() == 50)
    // the upstream persist is gone; the checkpoint must still serve
    CacheScope.releaseAll()
    assert(f.count() == 50)
  }

  test("disabled bypasses the memo and preserves the full logical plan") {
    var builds = 0
    val key = s"memo-spec-disabled-${System.nanoTime()}"
    def run() = QueryMemo.disabled {
      QueryMemo.cached(spark, key) {
        builds += 1
        spark.range(5).toDF("id").filter(col("id") > 1)
      }
    }
    val p1 = run()
    val p2 = run()
    assert(builds == 2, "disabled must rebuild every time (no memo write)")
    // the plan keeps its Range/Filter shape instead of a checkpoint leaf
    assert(!p1.queryExecution.analyzed.toString.contains("LogicalRDD"), p1
      .queryExecution.analyzed.toString)
    assert(p2.count() == 3)
    // and the bypass must not have populated the memo
    var after = 0
    QueryMemo.cached(spark, key) { after += 1; spark.range(1).toDF("id") }
    assert(after == 1, "disabled run must leave the memo cold for the key")
  }

  test("clear() restores a cold memo") {
    var builds = 0
    val key = s"memo-spec-clear-${System.nanoTime()}"
    def get() = QueryMemo.cached(spark, key) {
      builds += 1; spark.range(3).toDF("id")
    }
    get(); QueryMemo.clear(); get()
    assert(builds == 2, "clear() must force a rebuild")
  }

  test("clear() releases every RDD the build persisted (no block leak)") {
    val sc = spark.sparkContext
    QueryMemo.clear()
    val before = sc.getPersistentRDDs.keySet
    val key = s"memo-spec-leak-${System.nanoTime()}"
    val f = QueryMemo.cached(spark, key)(spark.range(1000).toDF("id"))
    assert(f.count() == 1000)
    val during = sc.getPersistentRDDs.keySet.diff(before)
    assert(during.nonEmpty, "localCheckpoint must register a persistent RDD")
    QueryMemo.clear()
    val leaked = sc.getPersistentRDDs.keySet.intersect(during)
    assert(leaked.isEmpty, s"memo blocks leaked after clear: $leaked")
  }

  test("disabled() nests: inner scope exit must not re-enable memoization") {
    var builds = 0
    val key = s"memo-spec-nest-${System.nanoTime()}"
    QueryMemo.disabled {
      QueryMemo.disabled {} // inner scope exits here
      // still inside the outer scope: cached() must keep bypassing
      QueryMemo.cached(spark, key) { builds += 1; spark.range(2).toDF("id") }
      QueryMemo.cached(spark, key) { builds += 1; spark.range(2).toDF("id") }
    }
    assert(builds == 2, "outer disabled scope was re-enabled by nested exit")
  }
}
