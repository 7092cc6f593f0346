package graft

import graft.functions.ShingleNGrams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShingleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  import spark.implicits._

  private def shingle(texts: String*): Seq[Seq[String]] =
    texts.toDF("text")
      .select(ShingleNGrams.column(split(col("text"), " "), 3).as("sh"))
      .collect().toSeq.map(_.getSeq[String](0))

  test("3-gram shingles: sliding, distinct, first-occurrence order") {
    assert(shingle("a b c d e") == Seq(Seq("a b c", "b c d", "c d e")))
    // duplicate shingles collapse
    assert(shingle("x y x y x y") == Seq(Seq("x y x", "y x y")))
  }

  test("short docs yield empty arrays, not errors") {
    assert(shingle("", "a", "a b") == Seq(Seq(), Seq(), Seq()))
  }

  test("minhash-LSH estimator recovers the exact-Jaccard pair set") {
    val d = "/root/testdata/sf0.001"
    val exact = graft.queries.Docs.docNgramJaccard(spark, d)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val est = graft.queries.Docs.docMinhashLsh(spark, d)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16-perm signatures on clear near-dups (planted pairs are ~0.99
    // Jaccard): the estimator must not miss any
    assert(exact.subsetOf(est), s"missed: ${exact -- est}")
  }

  test("matches the declarative HOF formulation on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val words = split(col("text"), " ")
    val hof = docs.select(col("doc_id"), array_distinct(
      when(size(words) >= 3,
        transform(sequence(lit(1), size(words) - 2),
          i => concat_ws(" ", element_at(words, i), element_at(words, i + 1),
            element_at(words, i + 2))))
        .otherwise(array())).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val native = docs
      .select(col("doc_id"), ShingleNGrams.column(words, 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native == hof)
  }
}
