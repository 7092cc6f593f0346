package graft

import java.util.regex.Pattern
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential tests for the r15 text-scoring operators:
  * on seeded random corpora, [[graft.queries.Docs.bm25Rank]] and
  * [[graft.queries.Docs.gopherMetrics]] must agree BIT-FOR-BIT with
  * obvious sequential plain-Scala reference implementations (the same
  * oracle relationship the DuckDB twins pin on the real corpus, here
  * over adversarial random inputs — ties, empty-ish docs, bullet/
  * symbol/digit soup, absent query terms). */
class TextScoringPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark

  // ---- plain-Scala references ------------------------------------

  /** BM25 with the exact arithmetic of bm25Rank: per-term score in the
    * written operand order, per-doc sum folded left-to-right over
    * TERM-SORTED scores. */
  private def referenceBm25(docs: Seq[(Long, String)], qterms: Set[String])
      : Map[Long, (Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = docs.length
    val dl = toks.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val avgdl = dl.values.sum.toDouble / n
    val tf = toks.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (id, w, g.length.toLong) }
    }
    val df = tf.filter(x => qterms(x._2)).groupBy(_._2)
      .map { case (w, g) => w -> g.length.toLong }
    tf.filter(x => qterms(x._2))
      .groupBy(_._1)
      .map { case (id, rows) =>
        val scores = rows.sortBy(_._2).map { case (_, w, tfl) =>
          // StrictMath, not math.log: Catalyst's Log expression evals
          // via StrictMath, which differs from the Math.log intrinsic
          // in the last ulp for some inputs (seen at seed 1, doc 7)
          val idf = StrictMath.log((n.toDouble - df(w) + 0.5) / (df(w) + 0.5) + 1.0)
          idf * (tfl.toDouble * 2.2) /
            (tfl.toDouble + 1.2 * (0.25 + 0.75 * (dl(id).toDouble / avgdl)))
        }
        id -> (rows.length.toLong, scores.foldLeft(0.0)(_ + _))
      }
  }

  /** The Gopher metrics with the exact arithmetic of gopherMetrics
    * (regexp_count = non-overlapping find count; split keeps trailing
    * empties like Spark's limit=-1 split). */
  private def referenceGopher(text: String): (Int, Double, Double, Double,
      Double, Double, Int, Boolean) = {
    def count(re: String, s: String): Int = {
      val m = Pattern.compile(re).matcher(s)
      var c = 0
      while (m.find()) c += 1
      c
    }
    val words = text.split(" ", -1)
    val lines = text.split("\n", -1)
    val nWords = words.length
    val meanWordLen = text.replace(" ", "").length.toDouble / nWords
    val symbolRatio = count("#|\\.\\.\\.", text).toDouble / nWords
    val bulletFrac = lines.count(l =>
      Pattern.compile("^[-*•]").matcher(l).find()).toDouble / lines.length
    val ellipsisFrac = lines.count(l =>
      Pattern.compile("\\.\\.\\.$").matcher(l).find()).toDouble / lines.length
    val alphaFrac = words.count(w =>
      Pattern.compile("[a-zA-Z]").matcher(w).find()).toDouble / nWords
    val stopHits = Seq("the", "a", "of", "and", "is")
      .count(wd => Pattern.compile(s"\\b$wd\\b").matcher(text).find())
    val keep = nWords >= 50 && nWords <= 100000 &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      symbolRatio < 0.1 && bulletFrac < 0.9 && ellipsisFrac < 0.3 &&
      alphaFrac > 0.8 && stopHits >= 2
    (nWords, meanWordLen, symbolRatio, bulletFrac, ellipsisFrac,
      alphaFrac, stopHits, keep)
  }

  // ---- generators (seeded, deterministic) ------------------------

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25Rank equals the sequential reference bit-for-bit on seeded random corpora") {
    val vocab = Vector("the", "a", "scan", "table", "merge", "vector",
      "stream", "q7", "123", "zz")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 30 + rnd.nextInt(30)).map { i =>
        val nw = 3 + rnd.nextInt(18)
        (i.toLong, Seq.fill(nw)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val qterms = Set("vector", "merge", "q7")
      val want = referenceBm25(docs, qterms)
      val got = graft.queries.Docs
        .bm25Rank(mkDocs(docs), qterms.toSeq.sorted, docs.length)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_terms"), r.getAs[Double]("score"))).toMap
      assert(got == want, s"seed $seed: " +
        s"only-spark=${got.keySet -- want.keySet} only-ref=${want.keySet -- got.keySet} " +
        s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
      assert(want.nonEmpty, s"seed $seed: vacuous corpus (no query-term hits)")
    }
  }

  test("gopherMetrics equals the reference bit-for-bit on seeded random bullet/symbol soup") {
    val tokens = Vector("the", "a", "of", "scan", "table", "#", "x...",
      "123", "9", "zz", "-", "•item")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 40).map { i =>
        val nLines = 1 + rnd.nextInt(4)
        val t = (0 until nLines).map { _ =>
          val nw = rnd.nextInt(25)
          val lead = if (rnd.nextBoolean()) "- " else ""
          lead + Seq.fill(nw)(tokens(rnd.nextInt(tokens.size))).mkString(" ")
        }.mkString("\n")
        (i.toLong, t)
      }
      val got = graft.queries.Docs.gopherMetrics(mkDocs(docs)).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("n_words"), r.getAs[Double]("mean_word_len"),
            r.getAs[Double]("symbol_ratio"), r.getAs[Double]("bullet_frac"),
            r.getAs[Double]("ellipsis_frac"), r.getAs[Double]("alpha_frac"),
            r.getAs[Int]("stop_hits"), r.getAs[Boolean]("keep"))).toMap
      docs.foreach { case (id, t) =>
        assert(got(id) == referenceGopher(t),
          s"seed $seed doc $id:\n'$t'\nspark=${got(id)}\nref  =${referenceGopher(t)}")
      }
    }
  }
}
