package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed near-dup (banded sign-LSH + exact verify) against the
  * brute-force all-pairs baseline: every emitted pair must be a true
  * pair (precision 1.0 — the verify step computes exact cosine), and
  * recall must stay useful. Both inputs are deterministic (fixed planes,
  * fixed parquet), so the observed recall is a constant, not a flake. */
class EmbNeardupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.extSpark
  private val d = "/root/testdata/sf0.001"

  private def pairs(q: String): Set[(Long, Long)] =
    SparkEntry.queries(q)(spark, d)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed pairs are a subset of the exact all-pairs result") {
    val bucketed = pairs("emb_neardup")
    val exact = pairs("emb_neardup_exact")
    assert(bucketed.nonEmpty, "bucketed result is empty")
    assert(bucketed.subsetOf(exact),
      s"false positives: ${bucketed -- exact}")
  }

  test("bucketed recall vs exact stays above 0.5 at sf0.001") {
    val bucketed = pairs("emb_neardup")
    val exact = pairs("emb_neardup_exact")
    val recall = bucketed.size.toDouble / exact.size
    info(s"recall = $recall (${bucketed.size}/${exact.size})")
    assert(recall >= 0.5, s"recall $recall")
  }
}
