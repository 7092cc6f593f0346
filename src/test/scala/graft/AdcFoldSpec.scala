package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Randomized differential for the [[graft.functions.AdcFold]] kernel:
  * compute must agree BIT-FOR-BIT with the plain-Scala left-to-right
  * fold it encodes, and the Spark-side expression must agree with the
  * aggregate(zip_with(codes, sequence(0, m−1), element_at), 0d, +) HOF
  * it replaced — including NULL on out-of-bounds slots and null codes.
  * Same differential pattern as NearestCodeProps. */
object AdcFoldProps extends Properties("AdcFold") {

  private val caseGen: Gen[(Array[Int], Array[Double], Int)] =
    for {
      kc <- Gen.choose(1, 8)
      m <- Gen.choose(0, 6)
      codes <- Gen.listOfN(m, Gen.choose(0, kc - 1))
      tarr <- Gen.listOfN(m * kc,
        Gen.chooseNum(-4.0, 4.0).map(x => math.rint(x * 4) / 4))
    } yield (codes.toArray, tarr.toArray, kc)

  property("compute == plain left-to-right fold") =
    Prop.forAll(caseGen) { case (codes, tarr, kc) =>
      var ref = 0.0
      codes.zipWithIndex.foreach { case (c, s) => ref += tarr(s * kc + c) }
      val got = graft.functions.AdcFold.compute(
        new GenericArrayData(codes.map(c => c: Any)),
        new GenericArrayData(tarr.map(t => t: Any)), kc)
      java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(ref)
    }
}

class AdcFoldSpec extends AnyFunSuite {

  lazy val spark = SparkTest.spark
  import spark.implicits._

  /** The exact HOF the kernel replaced (Similarity.adcFold pre-r17). */
  private def hof(codes: org.apache.spark.sql.Column,
      tarr: org.apache.spark.sql.Column, m: Int, kc: Int) =
    aggregate(
      zip_with(codes, sequence(lit(0), lit(m - 1)),
        (c, s) => element_at(tarr, s * kc + c + lit(1))),
      lit(0.0), (acc, x) => acc + x)

  private def frame(rows: Seq[(Seq[Int], Seq[Double])]): DataFrame =
    rows.toDF("codes", "tarr")
      .select(col("codes").cast("array<int>").as("codes"), col("tarr"))

  test("kernel == HOF bit-for-bit on in-range codes, incl. negative " +
    "zero and denormal-scale sums") {
    val kc = 4
    val m = 3
    val rows = Seq(
      (Seq(0, 1, 2), Seq.tabulate(12)(i => (i - 6) * 0.125)),
      (Seq(3, 3, 3), Seq.tabulate(12)(i => -0.0 + i * 1e-300)),
      (Seq(0, 0, 0), Seq.fill(12)(0.0)))
    val df = frame(rows)
      .withColumn("k", graft.functions.AdcFold.column(col("codes"), col("tarr"), m, kc))
      .withColumn("h", hof(col("codes"), col("tarr"), m, kc))
      .select(col("k"), col("h")).collect()
    df.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r)
    }
  }

  test("out-of-bounds slot NULLs the kernel's sum where the ANSI HOF " +
    "threw (both unreachable: an assigned code always has a table slot)") {
    val kc = 4
    // code 3 in subspace 2 -> slot 11, but tarr has only 8 entries
    val bad = frame(Seq((Seq(0, 1, 3), Seq.tabulate(8)(_.toDouble))))
    val k = bad
      .withColumn("k", graft.functions.AdcFold.column(col("codes"), col("tarr"), 3, kc))
      .select(col("k")).collect()(0)
    assert(k.isNullAt(0), k)
    // the replaced HOF under Spark 4 ANSI eval fails the whole query
    // on the same row — the kernel's NULL is the strictly safer edge
    val e = intercept[Exception] {
      bad.withColumn("h", hof(col("codes"), col("tarr"), 3, kc))
        .select(col("h")).collect()
    }
    assert(e.toString.toLowerCase.contains("invalid"), e.toString)
  }

  test("codes array not exactly m long NULLs the sum — a partially " +
    "corrupted artifact row scores NULL, never a plausible partial") {
    val kc = 4
    val rows = frame(Seq(
      (Seq(0, 1), Seq.tabulate(12)(_.toDouble)),        // too short
      (Seq(0, 1, 2, 3), Seq.tabulate(16)(_.toDouble)))) // too long
    val got = rows
      .withColumn("k", graft.functions.AdcFold.column(
        col("codes"), col("tarr"), 3, kc))
      .select(col("k")).collect()
    got.foreach(r => assert(r.isNullAt(0), r))
    // and the HOF it replaced NULLs the same rows (zip_with pads the
    // short side with null; element_at(null) is null) — differential
    val h = rows
      .withColumn("h", hof(col("codes"), col("tarr"), 3, kc))
      .select(col("h")).collect()
    h.foreach(r => assert(r.isNullAt(0), r))
  }

  test("generated code path compiles (no interpreted fallback in a " +
    "whole-stage context)") {
    val kc = 2
    val n = spark.range(100).select(
        array(lit(0), lit(1)).cast("array<int>").as("codes"),
        array(lit(1.0), lit(2.0), lit(3.0), lit(4.0)).as("tarr"))
      .select(graft.functions.AdcFold.column(col("codes"), col("tarr"), 2, kc).as("v"))
      .filter(col("v") === 5.0).count()
    assert(n == 100L)
  }
}
