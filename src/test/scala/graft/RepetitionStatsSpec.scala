package graft

import graft.functions.RepetitionStats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass repetition-stats expression against hand-counted
  * fixtures, plus its SQL registration and codegen path. */
class RepetitionStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark

  private def stats(text: String, n: Int): (Int, Int, Int) = {
    import spark.implicits._
    val r = Seq(text).toDF("t")
      .select(RepetitionStats.column(split(col("t"), " "), n).as("s"))
      .selectExpr("s.n_grams", "s.n_distinct", "s.top_count")
      .collect()(0)
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("unigram counts on a known string") {
    // a a b c a  → 5 grams, 3 distinct, top 'a' ×3
    assert(stats("a a b c a", 1) == ((5, 3, 3)))
  }

  test("bigram counts on a known string") {
    // bigrams of (a a a b a a): [a a][a a][a b][b a][a a] → 5 total,
    // 3 distinct, 'a a' ×3
    assert(stats("a a a b a a", 2) == ((5, 3, 3)))
  }

  test("gram size longer than the document yields zeros") {
    assert(stats("only two", 3) == ((0, 0, 0)))
  }

  test("uniform document: top equals total for n=1") {
    assert(stats("x x x x", 1) == ((4, 1, 4)))
  }

  test("SQL registration (repetition_stats) matches the column API") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq("a a b c a").toDF("t")
    df.createOrReplaceTempView("rs_in")
    val viaSql = spark.sql(
      "SELECT repetition_stats(split(t, ' '), 1) AS s FROM rs_in")
      .selectExpr("s.top_count").collect()(0).getInt(0)
    assert(viaSql == 3)
  }

  test("random documents match a naive Scala recount (n=1,2,3)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "dd", "e")
    val docs = Seq.fill(200)(
      Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    def naive(text: String, n: Int): (Int, Int, Int) = {
      val ws = text.split(" ", -1).toSeq
      val grams = ws.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).map(_._2.size)
      (grams.size, counts.size, if (counts.isEmpty) 0 else counts.max)
    }
    for (n <- 1 to 3) {
      val got = docs.toDF("t")
        .select(RepetitionStats.column(split(col("t"), " "), n).as("s"))
        .selectExpr("s.n_grams", "s.n_distinct", "s.top_count")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      val want = docs.map(naive(_, n))
      assert(got.toSeq == want,
        s"n=$n mismatch at ${got.toSeq.zip(want).indexWhere(p => p._1 != p._2)}")
    }
  }

  test("whole-stage codegen keeps the expression (no fallback compile errors)") {
    import spark.implicits._
    // a wide row batch through the codegen'd path; values spot-checked
    val out = (1 to 100).map(i => s"w$i w$i unique$i").toDF("t")
      .select(RepetitionStats.column(split(col("t"), " "), 1).as("s"))
      .selectExpr("sum(s.top_count) AS x").collect()(0).getLong(0)
    assert(out == 200L)
  }
}
