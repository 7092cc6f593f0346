package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run end to end at sf0.001 — a regression
  * net for the driver's Verify pass (oracle comparison happens there;
  * here we only guard against plan/runtime breakage). */
class QueriesSmokeSpec extends AnyFunSuite {

  // extensions session: evt_asof_big needs the AsOfJoin planner strategy
  lazy val spark: SparkSession = SparkTest.extSpark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      try {
        val n = fn(spark, "/root/testdata/sf0.001").count()
        assert(n >= 0)
      } finally CacheScope.releaseAll()
    }
  }
}
