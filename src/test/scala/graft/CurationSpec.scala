package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing + mixture-matching subsample: hand-computable
  * fixtures pin the interval arithmetic; invariants hold on the real
  * corpus. */
class CurationSpec extends AnyFunSuite {

  lazy val spark = SparkTest.spark
  private val d = "/root/testdata/sf0.001"

  private def mkDocs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("packSequences: hand-computed straddling doc lands in both sequences") {
    // source s: docs of 6, 3, 5 tokens at ctx=8.
    // starts/ends: [0,6) [6,9) [9,14) → doc2 straddles the seq0/seq1
    // boundary; seq0 = 8 tokens (docs 1,2), seq1 = 6 tokens (docs 2,3)
    def words(n: Int, p: String) = (0 until n).map(i => s"$p$i").mkString(" ")
    val docs = mkDocs(Seq(
      (1L, "s", words(6, "a")), (2L, "s", words(3, "b")),
      (3L, "s", words(5, "c"))))
    val got = Curation.packSequences(docs, ctx = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(("s", 0L, 2L, 2L, 8L), ("s", 1L, 2L, 1L, 6L)),
      s"got $got")
  }

  test("packSequences invariants on the corpus: token conservation, full interior sequences, per-source isolation") {
    val docs = Tables.documents(spark, d)
    val packed = Curation.packSequences(docs, ctx = 512)
    val perSource = packed.groupBy("source")
      .agg(sum("n_tokens").as("packed_tok"), max("seq_id").as("last_seq"),
        sum("n_docs_started").as("started"))
    val expected = docs.groupBy("source")
      .agg(sum(size(split(col("text"), " "))).as("raw_tok"),
        count(lit(1)).as("n_docs"))
    val joined = perSource.join(expected, "source").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("packed_tok") == r.getAs[Long]("raw_tok"),
        s"token loss in ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("started") == r.getAs[Long]("n_docs"),
        s"doc lost/duplicated in ${r.getAs[String]("source")}")
    }
    // every sequence except each source's last carries exactly ctx tokens
    val nonLast = packed.as("p").join(perSource.as("t"), "source")
      .filter(col("p.seq_id") < col("t.last_seq"))
      .filter(col("p.n_tokens") =!= 512)
    assert(nonLast.count() == 0, "interior sequence not full")
  }

  test("packSequences: duplicate doc_ids keep ROWS semantics — ties never sum together") {
    // Two docs share doc_id 1 (6 and 3 tokens) at ctx=8. Under the ROWS
    // frame each tie gets its own running sum → seq0 carries exactly 8
    // tokens, seq1 the remaining 1. Under the default RANGE frame both
    // ties would share end_tok=9 → (7, 2): corrupted token accounting.
    def words(n: Int, p: String) = (0 until n).map(i => s"$p$i").mkString(" ")
    val docs = mkDocs(Seq(
      (1L, "s", words(6, "a")), (1L, "s", words(3, "b"))))
    // (n_docs, n_docs_started, n_tokens) per seq — the n_tok secondary
    // sort pins the tie order to (3-tok, 6-tok), so doc counts are
    // deterministic too, not just the tie-order-invariant token sums
    val got = Curation.packSequences(docs, ctx = 8)
      .collect().map(r =>
        r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(0L -> ((2L, 2L, 8L)), 1L -> ((1L, 0L, 1L))), s"got $got")
  }

  test("mixtureSample: a weighted lang absent from the corpus caps the mixture at zero, and kept is never NULL") {
    import spark.implicits._
    val docs = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L))
      .toDF("doc_id", "lang", "n_chars")
    // fr is weighted but absent: the only mixture hitting 50/50 exactly
    // is the empty one — every doc must read kept=false, not drop fr
    // from the constraint (which would keep all of en)
    val out = Curation.mixtureSample(docs, Map("en" -> 50L, "fr" -> 50L))
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("kept")), "kept must not be NULL")
      assert(!r.getAs[Boolean]("kept"), "infeasible mixture must keep nothing")
    }
  }

  test("mixtureSample: achieved mixture is exactly floor(T*w/scale) per lang and the binding lang keeps all docs") {
    val weights = Map("en" -> 30L, "es" -> 25L, "zh" -> 20L,
      "de" -> 15L, "fr" -> 10L)
    val docs = Tables.documents(spark, d)
    val out = Curation.mixtureSample(docs, weights)
    val per = out.groupBy("lang").agg(
      count(lit(1)).as("n_total"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))).toMap
    val counts = per.map { case (l, (n, _)) => l -> n }
    val tMax = weights.keys.map(l => counts(l) * 100L / weights(l)).min
    weights.foreach { case (l, w) =>
      val expectedK = math.min(tMax * w / 100L, counts(l))
      assert(per(l)._2 == expectedK, s"$l kept ${per(l)._2} != $expectedK")
    }
    // the binding lang is the min in the tMax formula; floor can shave
    // at most (wt-1)/scale docs from it
    val binding = weights.keys.minBy(l => counts(l) * 100L / weights(l))
    assert(per(binding)._2 >= per(binding)._1 - 1,
      s"binding lang $binding lost more than rounding")
  }

  test("mixtureSample: kept subset is stable under reordering (hash-determined, not input-order)") {
    val docs = Tables.documents(spark, d)
    val w = Map("en" -> 50L, "es" -> 50L)
    val a = Curation.mixtureSample(docs, w)
      .filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Curation.mixtureSample(docs.orderBy(desc("n_chars")), w)
      .filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("bad configs fail fast") {
    val docs = Tables.documents(spark, d)
    intercept[IllegalArgumentException] { Curation.packSequences(docs, 0) }
    intercept[IllegalArgumentException] {
      Curation.mixtureSample(docs, Map("en" -> 0L))
    }
    intercept[IllegalArgumentException] {
      Curation.removeDupSpans(docs, 1)
    }
  }

  /** Count corpus-wide occurrences of a word span inside the cleaned
    * texts (with multiplicity, the removal semantics' own currency). */
  private def spanOccurrences(cleaned: Array[(Long, String)],
      span: Seq[String]): Int =
    cleaned.map { case (_, text) =>
      val ws = text.split(" ", -1)
      (0 to ws.length - span.length)
        .count(i => ws.slice(i, i + span.length).sameElements(span))
    }.sum

  test("removeDupSpans: a planted memorized span survives exactly once corpus-wide") {
    import spark.implicits._
    val planted = (0 until 8).map(i => s"memo$i") // the memorized span
    def noise(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, s"${noise("a", 10)} ${planted.mkString(" ")} ${noise("b", 10)}"),
      (2L, s"${noise("c", 5)} ${planted.mkString(" ")}"),
      (3L, s"${planted.mkString(" ")} ${noise("e", 12)}"),
      (4L, noise("f", 20))).toDF("doc_id", "text")
    val out = Curation.removeDupSpans(docs, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // token conservation per row
    out.foreach { case (id, nw, nk, nr, _) =>
      assert(nw == nk + nr, s"doc $id: $nw != $nk + $nr") }
    // the planted span survives exactly once across the whole corpus
    val cleaned = out.map(r => (r._1, r._5))
    assert(spanOccurrences(cleaned, planted) == 1,
      s"planted span count != 1 in ${cleaned.mkString("; ")}")
    // canonical copy = first by (doc_id, pos): doc 1 keeps it intact
    val d1 = cleaned.find(_._1 == 1L).get._2
    assert(d1.contains(planted.mkString(" ")))
    // untouched docs come back verbatim
    assert(cleaned.find(_._1 == 4L).get._2 == noise("f", 20))
  }

  test("removeDupSpans: overlapping occurrences never excise words of a canonical copy") {
    import spark.implicits._
    // doc 1 carries the span TWICE with overlap impossible at 8 words,
    // so use straight repetition: [m0..m7, m0..m7] — the second
    // occurrence is non-canonical, and the bridging spans (m4..m7 m0..
    // m3 etc.) are unique to doc 1 so only the planted span is dup'd
    val planted = (0 until 8).map(i => s"m$i")
    val docs = Seq(
      (1L, (planted ++ planted).mkString(" ")),
      (2L, s"x0 ${planted.mkString(" ")} x1")).toDF("doc_id", "text")
    val out = Curation.removeDupSpans(docs, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1)
    out.foreach { case (id, nw, nk, nr, _) =>
      assert(nw == nk + nr, s"doc $id: $nw != $nk + $nr") }
    val cleaned = out.map(r => (r._1, r._5))
    // doc 1's canonical first copy is intact; every other copy is gone
    assert(spanOccurrences(cleaned, planted) == 1)
    assert(cleaned.head._2.startsWith(planted.mkString(" ")))
  }

  test("removeDupSpans invariants on the corpus: conservation, no-op docs verbatim") {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    val out = Curation.removeDupSpans(docs, 8)
    assert(out.filter(col("n_words") =!= col("n_kept") + col("n_removed"))
      .count() == 0)
    // docs with nothing removed reassemble to their original text
    val joined = out.filter(col("n_removed") === 0)
      .join(docs, "doc_id")
      .filter(col("text_clean") =!= col("text"))
    assert(joined.count() == 0)
  }

  test("decontaminateSpans: a planted bench quote is excised from " +
    "EVERY train occurrence and survives in bench; train-only dup " +
    "spans are untouched") {
    import spark.implicits._
    val quote = (0 until 8).map(i => s"q$i") // the leaked bench span
    val trainDup = (0 until 8).map(i => s"t$i") // train-internal dup
    def noise(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val train = Seq(
      (1L, s"${noise("a", 10)} ${quote.mkString(" ")} ${noise("b", 10)}"),
      (2L, s"${quote.mkString(" ")} ${noise("c", 5)}"),
      (3L, s"${trainDup.mkString(" ")} ${noise("d", 9)}"),
      (4L, s"${noise("e", 4)} ${trainDup.mkString(" ")}"),
      (5L, noise("f", 20))).toDF("doc_id", "text")
    val bench = Seq(
      (100L, s"${noise("g", 3)} ${quote.mkString(" ")} ${noise("h", 3)}"))
      .toDF("doc_id", "text")
    val out = Curation.decontaminateSpans(train, bench, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    out.foreach { case (id, nw, nk, nr, _) =>
      assert(nw == nk + nr, s"doc $id: $nw != $nk + $nr") }
    val cleaned = out.map(r => (r._1, r._5))
    // the quote is gone from ALL train docs — no canonical protection
    // on the train side (the bench copy is the canonical one)
    assert(spanOccurrences(cleaned, quote) == 0,
      s"quote still present: ${cleaned.mkString("; ")}")
    // train-internal duplication is NOT this operator's business
    assert(spanOccurrences(cleaned, trainDup) == 2)
    // uncontaminated train docs come back verbatim
    assert(cleaned.find(_._1 == 5L).get._2 == noise("f", 20))
    // bench rows never enter the output (train corpus only)
    assert(!out.exists(_._1 == 100L))
  }
}
