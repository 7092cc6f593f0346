package graft

import graft.operators.Skew
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting helpers must be exactly equivalent to their unsalted shapes —
  * skew mitigation may never change results. */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private def skewed() =
    (1 to 2000).map { i =>
      val key = if (i % 10 != 0) "hot" else s"k${i % 37}"
      (i.toLong, key, (i % 100).toDouble)
    }.toDF("id", "key", "value")

  test("saltedAgg matches plain groupBy aggregate") {
    val df = skewed()
    val salted = Skew.saltedAgg(df, col("key"), col("id"), col("value"), 8)
      .orderBy("key").as[(String, Long, Double)].collect().toSeq
    val plain = df.groupBy(col("key").as("key"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .orderBy("key").as[(String, Long, Double)].collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin matches plain join") {
    val big = skewed()
    val small = Seq(("hot", "H"), ("k0", "A"), ("k10", "B"), ("k20", "C"))
      .toDF("key", "tag")
    val salted = Skew.saltedJoin(big, small, "key", col("id"), 8)
      .select("id", "key", "tag").orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    val plain = big.join(small, "key")
      .select("id", "key", "tag").orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(salted == plain)
  }

  test("salt spreads a hot key over the requested buckets") {
    val df = skewed().withColumn("s", Skew.salt(col("id"), 8))
    val buckets = df.filter(col("key") === "hot")
      .groupBy("s").count().collect()
    assert(buckets.length == 8) // every bucket hit
  }
}
