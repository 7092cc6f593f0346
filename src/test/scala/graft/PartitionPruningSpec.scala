package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning: the events stream written with the natural
  * time-partitioned layout (day=) must scan only the partitions a
  * time-ranged query names — at 100 TB this is the difference between
  * reading a day and reading a month. */
class PartitionPruningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark

  test("day-partitioned layout prunes scans for time-ranged queries") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString + "/ev"
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(out)

    val pruned = spark.read.parquet(out)
      .filter(col("day") === "2024-01-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)

    // observable effect: only one day's files are read
    val allDays = spark.read.parquet(out)
      .select(countDistinct(col("day"))).head().getLong(0)
    assert(allDays > 1)
    val n = pruned.count()
    val expected = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(to_date(col("ts")) === "2024-01-03").count()
    assert(n == expected && n > 0)

    // dynamic partition pruning: joining against a small dim that
    // filters days also prunes (the 100 TB fact x filtered-dim case)
    import spark.implicits._
    val dim = Seq(("2024-01-03", "target")).toDF("d_day", "tag")
    val dpp = spark.read.parquet(out)
      .join(dim, col("day") === to_date(col("d_day")))
    assert(dpp.count() == expected)
  }
}
