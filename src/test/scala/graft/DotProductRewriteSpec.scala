package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rewrite must swap the HOF dot product for the codegen
  * kernel without changing a single bit of output. Needs its own session
  * (extensions are install-time), built on the shared context. */
class DotProductRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.extSpark

  private lazy val dataPath: String = {
    import SparkTest.spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_dot").toString + "/v"
    Seq.tabulate(100)(i =>
      (i.toLong, Array.tabulate(16)(j => (i * 17 + j * 3) / 7.0),
        Array.tabulate(16)(j => (i * 5 + j * 11) / 13.0)))
      .toDF("id", "a", "b").write.parquet(p)
    p
  }

  // reads from parquet so constant folding can't collapse the plan
  private def hofDot(s: SparkSession) =
    s.read.parquet(dataPath).select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("dot"))

  test("rewrite fires: optimized plan contains dot_product, not aggregate") {
    val plan = hofDot(spark).queryExecution.optimizedPlan.toString
    assert(plan.contains("dot_product"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("aggregate("), s"HOF survived:\n$plan")
  }

  test("rewrite preserves NULL semantics: length mismatch and null elements") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_dotnull").toString + "/v"
    Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)), // length mismatch
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))) // null elem
      .toDF("id", "a", "b").write.parquet(p)
    def run(s: SparkSession) = s.read.parquet(p).select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("dot"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val withRule = run(spark)
    val without = run(SparkTest.spark)
    assert(withRule == without, s"rewrite diverged: $withRule vs $without")
    assert(withRule(1L) == 11.0 && withRule(2L) == null && withRule(3L) == null)
  }

  test("rewrite is bit-exact vs the interpreted HOF") {
    val rewritten = hofDot(spark).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // same expression on the shared session WITHOUT the extension
    val plainDf = hofDot(SparkTest.spark)
    assert(!plainDf.queryExecution.optimizedPlan.toString.contains("dot_product"))
    val plain = plainDf.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(rewritten == plain)
  }
}
