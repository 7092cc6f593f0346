package graft

import graft.operators.TextDedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The parameterized text near-dup miners beyond their oracle-pinned
  * default configs: thresholds nest, banding knobs hold their
  * guarantees, bad configs fail fast. */
class TextDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  private val d = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, d)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ngramJaccardPairs: a higher tau yields a subset of a lower tau") {
    val lo = pairs(TextDedup.ngramJaccardPairs(docs, 3, 0.3))
    CacheScope.releaseAll()
    val hi = pairs(TextDedup.ngramJaccardPairs(docs, 3, 0.6))
    CacheScope.releaseAll()
    assert(hi.subsetOf(lo), s"tau=0.6 pairs not within tau=0.3: ${hi -- lo}")
    assert(lo.size >= hi.size)
    assert(lo.nonEmpty)
  }

  test("ngramJaccardPairs: wider shingles are stricter (n=5 within n=2 at same tau)") {
    val n2 = pairs(TextDedup.ngramJaccardPairs(docs, 2, 0.5))
    CacheScope.releaseAll()
    val n5 = pairs(TextDedup.ngramJaccardPairs(docs, 5, 0.5))
    CacheScope.releaseAll()
    // not a subset theorem in general, but on this fixed corpus longer
    // shingles are strictly more discriminating — a deterministic pin
    assert(n5.size <= n2.size, s"n=5 (${n5.size}) should not exceed n=2 (${n2.size})")
  }

  test("minhashLshPairs: more bands can only add candidates (8x2 ⊇ 2x8 recall)") {
    val fewBands = pairs(TextDedup.minhashLshPairs(docs, 3, 16, 2, 0.5))
    CacheScope.releaseAll()
    val manyBands = pairs(TextDedup.minhashLshPairs(docs, 3, 16, 8, 0.5))
    CacheScope.releaseAll()
    // same k and estimator → same est_jaccard per pair; banding only
    // gates candidate generation, and 2-row bands (k=16, bands=8) are
    // strictly easier to match than 8-row bands (bands=2)
    assert(fewBands.subsetOf(manyBands),
      s"pairs lost when widening bands: ${fewBands -- manyBands}")
  }

  test("tau-boundary pair survives the size prune (float-rounding regression)") {
    // A: 102 distinct words -> 100 shingles; B = A's first 57 words ->
    // 55 shingles, all contained in A's. jaccard = 55/100 = 0.55
    // exactly. Without the admit-only slack, the prune computes
    // 0.55 * 100 = 55.000000000000007 > 55 and silently drops the pair.
    import spark.implicits._
    val wordsA = (0 until 102).map(i => s"w$i")
    val a = wordsA.mkString(" ")
    val b = wordsA.take(57).mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = pairs(TextDedup.ngramJaccardPairs(df, 3, 0.55))
    CacheScope.releaseAll()
    assert(got == Set((1L, 2L)), s"boundary pair dropped: $got")
  }

  test("bad configs fail fast") {
    intercept[IllegalArgumentException] {
      TextDedup.minhashLshPairs(docs, 3, 16, 5, 0.5) // 5 does not divide 16
    }
    intercept[IllegalArgumentException] {
      TextDedup.simhashPairs(docs, 3, 7, 3) // 7 does not divide 64
    }
    // the md5 family exists for bit-identical oracle replay, which
    // agree/k only provides when k is a power of two — k=12 must be
    // rejected loudly, not silently weaken the guarantee
    val e = intercept[IllegalArgumentException] {
      TextDedup.minhashMd5Pairs(docs, 3, 12, 4, 0.5)
    }
    assert(e.getMessage.contains("power of two"), e.getMessage)
  }

  test("simhashPairs: larger hamming radius is a superset") {
    val tight = TextDedup.simhashPairs(docs, 3, 8, 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheScope.releaseAll()
    val loose = TextDedup.simhashPairs(docs, 3, 8, 7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheScope.releaseAll()
    assert(tight.subsetOf(loose))
  }
}
