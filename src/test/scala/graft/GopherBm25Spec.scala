package graft

import graft.queries.Docs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gopher-rule filter and BM25 ranking on hand-computable fixtures:
  * each quality rule is falsified by exactly the doc crafted to break
  * it, and BM25 scores match the closed-form arithmetic. */
class GopherBm25Spec extends AnyFunSuite {

  lazy val spark = SparkTest.spark

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def words(n: Int, w: String) = Seq.fill(n)(w).mkString(" ")

  test("gopher rules: each crafted doc fails exactly its rule") {
    // 1: passes everything (60 varied words incl. two stopwords)
    val good = (words(29, "table") + " the a " +
      words(29, "scan")).trim
    // 2: too short (10 words)
    val short = "the a " + words(8, "table")
    // 3: symbol-heavy (7 '#' in 60 words ⇒ ratio > 0.1)
    val symbols = "the a " + words(51, "table") + " " + words(7, "#")
    // 4: bullet-heavy (9 of 10 lines start with '-')
    val bullets = (Seq("the a " + words(4, "table")) ++
      Seq.fill(9)("- " + words(5, "scan"))).mkString("\n")
    // 5: non-alpha words (all digits ⇒ alpha_frac 0)
    val digits = words(60, "123")
    // 6: no stopwords
    val stopless = words(60, "table")
    val got = Docs.gopherMetrics(mkDocs(Seq(
      (1L, good), (2L, short), (3L, symbols),
      (4L, bullets), (5L, digits), (6L, stopless))))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(got(1L).getAs[Boolean]("keep"), "good doc must pass")
    assert(!got(2L).getAs[Boolean]("keep") &&
      got(2L).getAs[Int]("n_words") == 10)
    assert(!got(3L).getAs[Boolean]("keep") &&
      got(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!got(4L).getAs[Boolean]("keep") &&
      got(4L).getAs[Double]("bullet_frac") == 0.9)
    assert(!got(5L).getAs[Boolean]("keep") &&
      got(5L).getAs[Double]("alpha_frac") == 0.0)
    assert(!got(6L).getAs[Boolean]("keep") &&
      got(6L).getAs[Int]("stop_hits") == 0)
  }

  test("bm25: two-doc corpus matches the closed form") {
    // d1 = "x x x q" (tf=1, dl=4), d2 = "x q q" (tf=2, dl=3)
    val out = Docs.bm25Rank(mkDocs(Seq(
      (1L, "x x x q"), (2L, "x q q"))), Seq("q"), 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("score")).toMap
    val n = 2.0; val df = 2.0; val avgdl = (4.0 + 3.0) / 2.0
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    assert(math.abs(out(1L) - s(1, 4)) < 1e-15, s"d1: ${out(1L)}")
    assert(math.abs(out(2L) - s(2, 3)) < 1e-15, s"d2: ${out(2L)}")
    assert(out(2L) > out(1L), "higher tf in a shorter doc must rank first")
  }

  test("bm25 saturation: monotone in tf, bounded by idf*(k1+1)") {
    // equal-length docs (dl=10), tf = 1..5 of 'q', filler 'x'
    val docs = (1 to 5).map(tf =>
      (tf.toLong, (words(tf, "q") + " " + words(10 - tf, "x")).trim))
    val out = Docs.bm25Rank(mkDocs(docs), Seq("q"), 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("score")).toMap
    val idfCap = math.log((5.0 - 5.0 + 0.5) / (5.0 + 0.5) + 1.0) * 2.2
    (1L to 4L).foreach(tf => assert(out(tf) < out(tf + 1),
      s"score must grow with tf ($tf)"))
    (1L to 5L).foreach(tf => assert(out(tf) < idfCap,
      s"score must stay below the idf*(k1+1) asymptote ($tf)"))
  }

  test("gopher rules run unchanged on a stream: micro-batched replay equals batch") {
    // gopherMetrics is a stateless projection, so it applies to a
    // streaming frame as-is — the on-arrival quality gate a streaming
    // curation pipeline runs before admitting a doc. Parity with the
    // batch pass over the same corpus is by construction; this pins it.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val q = Docs.gopherMetrics(in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("gopher_stream").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("gopher_stream").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.toSeq.toList).toMap
    val batch = Docs.docGopher(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.toSeq.toList).toMap
    assert(streamed == batch)
  }

  test("bm25 multi-term: per-doc score is the sum over matched terms") {
    // doc contains both terms once; singles contain one each
    val out = Docs.bm25Rank(mkDocs(Seq(
      (1L, "q r x x"), (2L, "q x x x"), (3L, "r x x x"))),
      Seq("q", "r"), 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms"), r.getAs[Double]("score"))).toMap
    assert(out(1L)._1 == 2 && out(2L)._1 == 1 && out(3L)._1 == 1)
    // same tf/dl/df for q and r ⇒ doc1's score is exactly the sum of
    // the singles' per-term contributions computed at df=2, N=3
    val n = 3.0; val avgdl = 4.0
    val idf = math.log((n - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    assert(math.abs(out(1L)._2 - (s(1, 4) + s(1, 4))) < 1e-15)
  }
}
