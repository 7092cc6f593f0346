package graft

import graft.functions.TopKLongs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded TopKLongs aggregate must be exactly equivalent to the
  * window row_number ≤ k formulation, independent of partitioning. */
class TopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  import spark.implicits._

  private def scores() =
    (1 to 5000).map { i =>
      (s"g${i % 7}", (i * 2654435761L) % 1000, i.toLong)
    }.toDF("g", "score", "id")

  test("topk_longs matches window row_number <= k") {
    val df = scores()
    val viaAgg = df.groupBy("g")
      .agg(TopKLongs.column(col("score"), col("id"), 5).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.score"), col("t.payload").as("id"))
      .orderBy("g", "id").as[(String, Long, Long)].collect().toSeq
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5).select("g", "score", "id")
      .orderBy("g", "id").as[(String, Long, Long)].collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("result independent of input partitioning (merge path)") {
    val df = scores()
    def run(parts: Int) = df.repartition(parts).groupBy("g")
      .agg(TopKLongs.column(col("score"), col("id"), 3).as("top"))
      .select(col("g"), col("top").cast("string"))
      .orderBy("g").as[(String, String)].collect().toSeq
    assert(run(1) == run(17))
  }

  test("approx_count_distinct within declared 1% error") {
    val df = scores().select(col("g"), col("id"))
    val rows = df.groupBy("g")
      .agg(approx_count_distinct(col("id"), 0.01).as("a"),
        countDistinct(col("id")).as("e"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (g, a, e) =>
      assert(math.abs(a - e).toDouble / e < 0.05, s"group $g: approx $a vs exact $e")
    }
  }
}
