package graft

import graft.queries.{Embeddings, Scoring}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r15 operator wave: Lloyd's k-means (production mergeable-avg
  * path vs the oracle-replay seq-fold twin), the bigram-LM quality
  * score, DSIR importance weights, and the per-domain cap — each on
  * hand-computable fixtures plus the corpus-level invariants the
  * oracle hash can't articulate on its own. */
class KmeansScoringSpec extends AnyFunSuite {

  lazy val spark = SparkTest.spark
  private val d = "/root/testdata/sf0.001"

  private def mkDocs(rows: Seq[(Long, String, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ---------------------------------------------------------- k-means

  test("kmeans: production (mergeable avg) and seq-fold twin agree on " +
    "every assignment") {
    val v = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val prod = operators.Similarity.kmeans(v, k = 8, iters = 3)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val twin = Embeddings.kmeansSeqFold(v, k = 8, iters = 3)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(prod.size == 500 && twin.size == 500)
    assert(prod == twin)
  }

  test("kmeans: Lloyd's objective is non-increasing over rounds") {
    val v = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val inertia = (1 to 3).map { it =>
      Embeddings.kmeansSeqFold(v, k = 8, iters = it)
        .agg(sum("d2")).collect()(0).getDouble(0)
    }
    assert(inertia(1) <= inertia(0) + 1e-9, inertia.toString)
    assert(inertia(2) <= inertia(1) + 1e-9, inertia.toString)
  }

  test("kmeans: production assignment never shuffles the corpus " +
    "(no vec_id exchange; map-side argmin fold)") {
    val v = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val p = operators.Similarity.kmeans(v, k = 8, iters = 3)
      .queryExecution.executedPlan.toString
    CacheScope.releaseAll()
    assert(!p.contains("hashpartitioning(vec_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("kmeans: separable fixture recovers the true clusters") {
    import spark.implicits._
    // two tight blobs far apart; seeds 0,1 land one in each
    val rows = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0)),
      (2L, Array(0.1, 0.0)), (3L, Array(0.0, 0.1)),
      (4L, Array(10.1, 10.0)), (5L, Array(10.0, 10.1)))
    val got = operators.Similarity.kmeans(
      rows.toDF("vec_id", "e"), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(0L) == got(2L) && got(0L) == got(3L))
    assert(got(1L) == got(4L) && got(1L) == got(5L))
    assert(got(0L) != got(1L))
  }

  // ----------------------------------------------------- LM scoring

  test("lmScore: repeated-bigram doc scores more typical (lower nll) " +
    "than the one-off scramble") {
    // 'a b' dominates the corpus; doc 3's 'q z' bigrams are rare
    val docs = mkDocs(Seq(
      (1L, "a b a b a b a b", "en", "s", 0L),
      (2L, "a b a b a b", "en", "s", 0L),
      (3L, "q z q z", "en", "s", 0L)))
    val out = Scoring.lmScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("nll"))).toMap
    assert(out(1L)._1 == 7L && out(3L)._1 == 3L)
    assert(out(1L)._2 < out(3L)._2)
    assert(out.values.forall(v => java.lang.Double.isFinite(v._2)))
  }

  test("lmScore: tertile buckets partition the corpus") {
    val out = Scoring.docLmScore(spark, d)
      .groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("head", "middle", "tail"), out.toString)
    val n = out.values.sum
    // exact thirds up to quantile ties
    assert(out.values.forall(c => c >= n / 3 - 2 && c <= n / 3 + 2), out.toString)
  }

  // ----------------------------------------------------------- DSIR

  test("dsirSelect: docs made of target-only tokens outrank raw-only docs") {
    // target slice speaks 'tgt'; raw background speaks 'bg'
    val docs = mkDocs(
      (1L to 10L).map(i => (i, "tgt tok " + i, "en", "s", 0L)) ++
        (11L to 20L).map(i => (i, "bg noise " + i, "de", "s", 0L)))
    val top = Scoring.dsirSelect(docs, col("lang") === "en", 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(top == (1L to 10L).toSet, top.toString)
  }

  // ----------------------------------------------------- domain cap

  test("domainCap: keeps exactly cap docs per oversized source, " +
    "preferring the longest") {
    val docs = mkDocs(
      (1L to 5L).map(i => (i, "x", "en", "big", i * 10)) ++
        Seq((6L, "x", "en", "small", 100L)))
    val out = Scoring.domainCap(docs, cap = 3).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dropped"), r.getAs[Long]("kept_chars"))).toMap
    // longest 3 of big = n_chars 50, 40, 30
    assert(out("big") == ((5L, 3L, 2L, 120L)), out.toString)
    assert(out("small") == ((1L, 1L, 0L, 100L)), out.toString)
  }

  // ---------------------------------------- learned quality classifier

  test("qualityClassifier: the learned model beats the majority-class " +
    "baseline on the real corpus (it generalizes the teacher, not " +
    "parrots a constant)") {
    try {
      val rows = Scoring.docQualityClassifier(spark, d).collect()
      val n = rows.map(_.getAs[Long]("n_docs")).sum
      val tk = rows.map(_.getAs[Long]("n_teacher_keep")).sum
      val pk = rows.map(_.getAs[Long]("n_pred_keep")).sum
      val ag = rows.map(_.getAs[Long]("n_agree")).sum
      val majority = math.max(tk, n - tk).toDouble / n
      info(f"acc=${ag.toDouble / n}%.3f majority=$majority%.3f " +
        f"pred_keep=$pk/$n teacher_keep=$tk/$n")
      assert(ag.toDouble / n > majority,
        s"agree=$ag of $n does not beat majority $majority")
      // non-constant predictor: both predicted classes are inhabited
      assert(pk > 0 && pk < n, s"constant predictor: pred_keep=$pk of $n")
    } finally CacheScope.releaseAll()
  }

  test("qualityClassifier: separable fixture is classified perfectly") {
    // positives: long alpha docs with stopwords; negatives: symbol soup
    val good = "the a of and is " + Seq.fill(50)("alpha beta gamma")
      .mkString(" ")
    val bad = Seq.fill(60)("### ... ##").mkString(" ")
    val docs = mkDocs((1L to 6L).map { i =>
      if (i % 2 == 0) (i, good + " tail" + i, "en", "s" + i, 100L)
      else (i, bad + " t" + i, "en", "s" + i, 100L)
    })
    try {
      val out = Scoring.qualityClassifier(docs).collect()
      val agree = out.map(_.getAs[Long]("n_agree")).sum
      assert(agree == 6L, out.mkString(","))
    } finally CacheScope.releaseAll()
  }
}
