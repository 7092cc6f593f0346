package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing (SURVEY §5): both fact tables written
  * bucketed by the join key join WITHOUT a shuffle — the 100 TB path
  * for repeated big-big joins. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val base = SparkTest.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", -1) // force SMJ path
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("bucketed tables join with zero exchanges") {
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d).write.bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, d).write.bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side: bucket layout IS the
    // clustered distribution (the single exchange allowed is the final
    // tiny aggregation)
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"), plan)

    // and it is correct
    val viaPlain = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val viaBucketed = joined.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaBucketed == viaPlain)
  }
}
