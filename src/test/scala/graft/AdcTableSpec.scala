package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.AdcTable]] vs the transform+slice+dot HOF it
  * replaced in the bulk kNN join: bit-identical tables on well-formed
  * codebook arrays, element-level NULLs on the malformed edges. */
class AdcTableSpec extends AnyFunSuite {

  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val sub = 4

  /** The exact HOF formulation AdcTable replaced. */
  private def hof(qe: org.apache.spark.sql.Column,
      cb: org.apache.spark.sql.Column) =
    transform(cb, e =>
      graft.functions.DotProduct.column(
        slice(qe, e.getField("s") * sub + 1, lit(sub)), e.getField("ce")))

  private def frame(qe: Seq[Double],
      cb: Seq[(Int, Seq[Double])]): DataFrame =
    Seq((qe, cb)).toDF("qe", "cb")
      .select(col("qe"),
        col("cb").cast("array<struct<s:int,ce:array<double>>>").as("cb"))

  test("kernel == HOF bit-for-bit on a dense slot-ordered codebook") {
    val qe = Seq.tabulate(8)(i => (i - 3) * 0.375)
    val cb = for (s <- 0 to 1; c <- 0 to 2)
      yield (s, Seq.tabulate(sub)(j => (s + 1) * 0.25 - c * j * 0.125))
    val r = frame(qe, cb)
      .select(
        graft.functions.AdcTable.column(col("qe"), col("cb"), sub).as("k"),
        hof(col("qe"), col("cb")).as("h"))
      .collect()(0)
    val k = r.getSeq[java.lang.Double](0)
    val h = r.getSeq[java.lang.Double](1)
    assert(k.size == 6 && h.size == 6)
    k.zip(h).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b), (a, b))
    }
  }

  test("malformed slots NULL element-wise exactly like the HOF: window " +
    "past qe, wrong-length ce") {
    val qe = Seq.tabulate(8)(_ * 0.5)
    val cb = Seq(
      (0, Seq(1.0, 2.0, 3.0, 4.0)), // valid
      (2, Seq(1.0, 1.0, 1.0, 1.0)), // s=2 -> window [8..12) past qe
      (1, Seq(1.0, 2.0)))           // ce length 2 != sub
    val r = frame(qe, cb)
      .select(
        graft.functions.AdcTable.column(col("qe"), col("cb"), sub).as("k"),
        hof(col("qe"), col("cb")).as("h"))
      .collect()(0)
    val k = r.getSeq[java.lang.Double](0)
    val h = r.getSeq[java.lang.Double](1)
    assert(k(0) != null && h(0) != null &&
      java.lang.Double.doubleToLongBits(k(0)) ==
        java.lang.Double.doubleToLongBits(h(0)))
    assert(k(1) == null && h(1) == null, (k(1), h(1)))
    assert(k(2) == null && h(2) == null, (k(2), h(2)))
  }

  test("generated code path works in a whole-stage context") {
    val n = spark.range(50).select(
        array((0 until 8).map(i => lit(i.toDouble)): _*).as("qe"),
        array(struct(lit(1).as("s"),
          array(lit(1.0), lit(0.0), lit(0.0), lit(0.0)).as("ce"))).as("cb"))
      .select(graft.functions.AdcTable.column(col("qe"), col("cb"), sub).as("t"))
      .filter(element_at(col("t"), 1) === 4.0).count()
    assert(n == 50L)
  }
}
