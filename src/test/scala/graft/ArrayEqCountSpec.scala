package graft

import graft.functions.ArrayEqCount
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd signature-agreement kernel must agree exactly with the
  * interpreted HOF formulation on the inputs signatures actually are
  * (equal-length, null-free); on ragged/null inputs it is deliberately
  * STRICTER (NULL, where the HOF null-pads and counts 0) — pinned
  * below. */
class ArrayEqCountSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.extSpark
  import spark.implicits._

  private def hof = aggregate(
    zip_with(col("a"), col("b"), (x, y) => when(x === y, 1).otherwise(0)),
    lit(0), (acc, v) => acc + v)

  test("matches the HOF formulation on random int arrays") {
    val rng = new scala.util.Random(3)
    val rows = Seq.fill(500) {
      val n = rng.nextInt(20)
      (Seq.fill(n)(rng.nextInt(4)), Seq.fill(n)(rng.nextInt(4)))
    }
    val df = rows.toDF("a", "b")
      .withColumn("native", ArrayEqCount.column(col("a"), col("b")))
      .withColumn("viaHof", hof)
    assert(df.filter(not(col("native") <=> col("viaHof"))).count() == 0)
  }

  test("NULL on length mismatch and on null elements (stricter than the HOF)") {
    val df = Seq(
      (Seq(1, 2, 3), Seq(1, 2)),
      (Seq(1, 2), Seq(1, 2))
    ).toDF("a", "b")
      .withColumn("native", ArrayEqCount.column(col("a"), col("b")))
      .withColumn("viaHof", hof)
    val got = df.select("native").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq == Seq(None, Some(2)))
    // the HOF null-pads ragged arrays to a non-null count — the native
    // kernel intentionally diverges there
    val hofRagged = df.select("viaHof").collect()(0)
    assert(!hofRagged.isNullAt(0) && hofRagged.getInt(0) == 2)

    val withNullElem = spark.sql(
      "SELECT array_eq_count(array(1, CAST(NULL AS INT)), array(1, 2)) AS c")
    assert(withNullElem.collect()(0).isNullAt(0))
  }

  test("SQL-registered and codegen'd") {
    val one = spark.sql(
      "SELECT array_eq_count(array(1,2,3), array(1,9,3)) AS c").collect()(0).getInt(0)
    assert(one == 2)
  }
}
