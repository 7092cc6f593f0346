package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The runtime bloom-filter join-pruning shape GraftSession enables: a
  * selective filter on the dim side must become a row-level
  * BloomFilterMightContain on the fact side's scan, so at 100 TB the
  * fact table is pruned BEFORE its shuffle instead of shuffling rows
  * that cannot join. Thresholds are lowered to fire at test scale —
  * production keeps the defaults (10M creation-side rows / 10 GB
  * application-side scan). */
class BloomFilterJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  private val d = "/root/testdata/sf0.001"

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter on the fact scan side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: runtime filters only pay off when the
      // fact side would otherwise shuffle in full
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val orders = Tables.orders(spark, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = Tables.lineitem(spark, d)
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"expected a runtime bloom filter in the optimized plan:\n$plan")
      // and it must not change results
      val rows = joined.collect()
      assert(rows.length == 1 && rows(0).getAs[Any]("qty") != null)
    }
  }

  test("bloom pruning keeps results identical to the unfiltered plan") {
    val expected = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
    }
    val got = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
    }
    assert(got == expected)
  }
}
