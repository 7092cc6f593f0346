package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential for the [[graft.functions.BpeApplyMerges]]
  * kernel: on arbitrary symbol sequences and merge tables (null
  * symbols, null rules, empty-string sides, rules that re-trigger on
  * their own output) the tight-loop compute must agree with an obvious
  * plain-Scala sequential fold implementing the greedy left-to-right
  * semantics the scaladoc specifies. Same differential pattern as
  * NearestCodeProps / NearestCosineProps. */
object BpeApplyMergesProps extends Properties("BpeApplyMerges") {

  /** The obvious reference: per rule in order, scan left to right,
    * collapse adjacent (lhs, rhs); the merged symbol remains the left
    * comparison target within the same pass. Null / empty-sided rules
    * are skipped; null symbols never match and pass through. */
  private def reference(syms: Seq[Option[String]],
      merges: Seq[Option[(Option[String], Option[String])]]): Seq[Option[String]] = {
    var cur = syms.toVector
    merges.foreach {
      case Some((Some(l), Some(r))) if l.nonEmpty && r.nonEmpty =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
        cur.foreach { x =>
          if (out.nonEmpty && out.last == Some(l) && x == Some(r))
            out(out.length - 1) = Some(l + r)
          else out += x
        }
        cur = out.toVector
      case _ => ()
    }
    cur
  }

  private val symGen: Gen[Option[String]] = Gen.frequency(
    (8, Gen.oneOf("a", "b", "c", "ab", "aa", "ba").map(Some(_))),
    (1, Gen.const(Some(""))),
    (1, Gen.const(None)))

  private val ruleGen: Gen[Option[(Option[String], Option[String])]] =
    Gen.frequency(
      (10, for {
        l <- Gen.oneOf("a", "b", "c", "ab", "aa", "ba", "aab")
        r <- Gen.oneOf("a", "b", "c", "ab", "aa", "ba")
      } yield Some((Some(l): Option[String], Some(r): Option[String]))),
      (1, Gen.const(Some((Some(""): Option[String], Some("a"): Option[String])))),
      (1, Gen.const(Some((None: Option[String], Some("a"): Option[String])))),
      (1, Gen.const(None)))

  private def toArr(syms: Seq[Option[String]]): GenericArrayData =
    new GenericArrayData(syms.map {
      case Some(s) => UTF8String.fromString(s)
      case None => null
    }.toArray[Any])

  private def toMerges(ms: Seq[Option[(Option[String], Option[String])]]): GenericArrayData =
    new GenericArrayData(ms.map {
      case Some((l, r)) => InternalRow(
        l.map(UTF8String.fromString).orNull,
        r.map(UTF8String.fromString).orNull)
      case None => null
    }.toArray[Any])

  property("compute == plain-Scala greedy fold (random syms + rules)") =
    Prop.forAll(Gen.listOf(symGen), Gen.listOf(ruleGen)) { (syms, rules) =>
      val got = graft.functions.BpeApplyMerges
        .compute(toArr(syms), toMerges(rules))
      val want = reference(syms, rules)
      val gotSeq = (0 until got.numElements()).map(i =>
        if (got.isNullAt(i)) None else Some(got.getUTF8String(i).toString))
      (gotSeq == want) :| s"syms=$syms rules=$rules got=$gotSeq want=$want"
    }
}

/** End-to-end pins for the in-engine BPE tokenizer
  * (graft.operators.BpeTokenizer): the scaladoc's canonical fold
  * examples, an exact train-determinism fixture on a known tiny corpus
  * (the whole merge table, byte for byte), a save/load round-trip, the
  * fail-fast load checks, and the empty / fully-merged edges. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark

  private def applyRules(syms: Seq[String], rules: Seq[(String, String)]): Seq[String] = {
    val got = graft.functions.BpeApplyMerges.compute(
      new GenericArrayData(syms.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(rules.map { case (l, r) =>
        InternalRow(UTF8String.fromString(l), UTF8String.fromString(r))
      }.toArray[Any]))
    (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
  }

  test("kernel: the scaladoc's sequential-fold examples hold") {
    // rule (a,a): the freshly merged symbol is itself eligible as the
    // LEFT side of the next comparison within the same pass
    assert(applyRules(Seq("a", "a", "a", "a"), Seq(("a", "a"))) == Seq("aa", "aa"))
    assert(applyRules(Seq("a", "a", "a"), Seq(("a", "a"))) == Seq("aa", "a"))
    // rank order matters: (a,b) then (ab,c) cascades; reversed does not
    assert(applyRules(Seq("a", "b", "c"), Seq(("a", "b"), ("ab", "c"))) == Seq("abc"))
    assert(applyRules(Seq("a", "b", "c"), Seq(("ab", "c"), ("a", "b"))) == Seq("ab", "c"))
  }

  /** Hand-derived merge table for the fixture corpus
    * {"ab ab abc def", "ab cd ab", "xyz ab"}: word counts are
    * ab:5 abc:1 def:1 cd:1 xyz:1, so round 1 merges (a,b) with
    * weight 6; every later round is an all-ties round resolved by the
    * (cnt DESC, pair ASC) tie-break; rounds past 7 find the vocabulary
    * fully merged and record nothing (the dummy-guard edge). */
  private val fixtureCorpus = Seq(
    (1L, "ab ab abc def"), (2L, "ab cd ab"), (3L, "xyz ab"))
  private val fixtureMerges = Seq(
    (1, "a", "b", 6L), (2, "ab", "c", 1L), (3, "c", "d", 1L),
    (4, "d", "e", 1L), (5, "de", "f", 1L), (6, "x", "y", 1L),
    (7, "xy", "z", 1L))

  test("train: exact merge table on the fixture corpus, fully-merged rounds record nothing") {
    import spark.implicits._
    val docs = fixtureCorpus.toDF("doc_id", "text")
    val model = graft.operators.BpeTokenizer.train(docs, numMerges = 8)
    val got = model.merges
      .orderBy("rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    CacheScope.releaseAll()
    assert(got == fixtureMerges)
  }

  test("train is deterministic: two runs produce identical tables") {
    import spark.implicits._
    val docs = fixtureCorpus.toDF("doc_id", "text")
    val a = graft.operators.BpeTokenizer.train(docs, 4).merges.orderBy("rank")
      .collect().map(_.toSeq).toSeq
    CacheScope.releaseAll()
    val b = graft.operators.BpeTokenizer.train(docs, 4).merges.orderBy("rank")
      .collect().map(_.toSeq).toSeq
    CacheScope.releaseAll()
    assert(a == b && a.length == 4)
  }

  test("encodeCounts: fixture corpus token counts against the learned table") {
    import spark.implicits._
    val docs = fixtureCorpus.toDF("doc_id", "text")
    val model = graft.operators.BpeTokenizer.train(docs, 8)
    val got = graft.operators.BpeTokenizer.encodeCounts(docs, model)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    CacheScope.releaseAll()
    // all fixture words collapse to a single symbol after 7 merges
    assert(got == Seq((1L, 4L, 4L), (2L, 3L, 3L), (3L, 2L, 2L)))
  }

  test("save/load round-trip: reloaded model encodes identically") {
    import spark.implicits._
    val docs = fixtureCorpus.toDF("doc_id", "text")
    val model = graft.operators.BpeTokenizer.train(docs, 8)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    graft.operators.BpeTokenizer.save(model, dir)
    // consume the in-memory model fully BEFORE releaseAll: its plan
    // chains from the train loop's localCheckpoints
    val inlineMerges = model.merges.orderBy("rank").collect().map(_.toSeq).toSeq
    val inline = graft.operators.BpeTokenizer.encodeCounts(docs, model)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    CacheScope.releaseAll()
    val reloaded = graft.operators.BpeTokenizer.load(spark, dir)
    assert(reloaded.merges.orderBy("rank").collect().map(_.toSeq).toSeq ==
      inlineMerges)
    val viaArtifact = graft.operators.BpeTokenizer.encodeCounts(docs, reloaded)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaArtifact == inline)
  }

  test("load fail-fast: duplicate and gapped rank tables refuse to load") {
    import spark.implicits._
    val docs = fixtureCorpus.toDF("doc_id", "text")
    val model = graft.operators.BpeTokenizer.train(docs, 4)
    val dir = java.nio.file.Files.createTempDirectory("bpe_corrupt").toString
    graft.operators.BpeTokenizer.save(model, dir)
    CacheScope.releaseAll()
    // materialize the clean table driver-side: the corrupted variants
    // overwrite the same path the clean frame would otherwise lazily read
    val cleanRows = spark.read.parquet(s"$dir/merges").orderBy("rank")
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    def writeMerges(rows: Seq[(Int, String, String, Long)]): Unit =
      rows.toDF("rank", "lhs", "rhs", "cnt")
        .write.mode("overwrite").parquet(s"$dir/merges")
    // duplicate rank: {1,2,3,1} — max 3 <= stamped 4 and count 4 <= 4,
    // so only the distinct-rank check can reject this table
    writeMerges(cleanRows.filter(_._1 != 4) :+ cleanRows.head)
    val dup = intercept[IllegalArgumentException] {
      graft.operators.BpeTokenizer.load(spark, dir)
    }
    assert(dup.getMessage.contains("refusing"))
    // gapped rank: {1,2,4} — max 4 == stamped 4 but count 3 != max
    writeMerges(cleanRows.filter(_._1 != 3))
    val gap = intercept[IllegalArgumentException] {
      graft.operators.BpeTokenizer.load(spark, dir)
    }
    assert(gap.getMessage.contains("refusing"))
  }

  test("trainLocal: byte-identical merge table to the distributed loop (fixture)") {
    import spark.implicits._
    val docs = fixtureCorpus.toDF("doc_id", "text")
    val got = graft.operators.BpeTokenizer
      .trainLocal(docs, 8, maxVocab = Int.MaxValue)
      .merges.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == fixtureMerges)
  }

  test("trainLocal: parity with distributed train on the sf0.001 documents corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dist = graft.operators.BpeTokenizer.train(docs, 16)
      .merges.orderBy("rank").collect().map(_.toSeq).toSeq
    CacheScope.releaseAll()
    val local = graft.operators.BpeTokenizer
      .trainLocal(docs, 16, maxVocab = Int.MaxValue)
      .merges.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(local == dist)
  }

  test("trainAgg: byte-identical merge table to the distributed loop " +
    "(fixture + sf0.001 corpus) — the r21 one-aggregate trainer") {
    import spark.implicits._
    val fix = fixtureCorpus.toDF("doc_id", "text")
    val gotFix = graft.operators.BpeTokenizer.trainAgg(fix, 8)
      .merges.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(gotFix == fixtureMerges)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dist = graft.operators.BpeTokenizer.train(docs, 16)
      .merges.orderBy("rank").collect().map(_.toSeq).toSeq
    CacheScope.releaseAll()
    val agg = graft.operators.BpeTokenizer.trainAgg(docs, 16)
      .merges.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(agg == dist)
  }

  test("mergeWordCounts: absorbed increments train the identical " +
    "table to a from-scratch run — old text never re-read") {
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val cut = all.agg(expr("percentile(doc_id, 0.5)"))
      .collect()(0).getDouble(0)
    val a = all.filter(col("doc_id") <= cut)
    val b = all.filter(col("doc_id") > cut)
    val wc = graft.operators.BpeTokenizer.mergeWordCounts(
      graft.operators.BpeTokenizer.wordCounts(a),
      graft.operators.BpeTokenizer.wordCounts(b))
    // the count state is exact: merged rows == one-pass rows
    val mergedRows = wc.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val oneShotRows = graft.operators.BpeTokenizer.wordCounts(all)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(mergedRows == oneShotRows)
    // and the derived merge table is byte-identical to a retrain
    val viaCounts = graft.operators.BpeTokenizer
      .trainFromCounts(wc, 16, maxVocab = Int.MaxValue)
      .merges.orderBy("rank").collect().map(_.toSeq).toSeq
    val retrained = graft.operators.BpeTokenizer
      .trainLocal(all, 16, maxVocab = Int.MaxValue)
      .merges.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(viaCounts == retrained && viaCounts.nonEmpty)
  }

  test("trainLocal: UTF-8-byte tie-break matches Spark collation on supplementary chars") {
    import spark.implicits._
    // U+1F600 sorts ABOVE U+FFFD in UTF-8 bytes (F0.. > EF..) but BELOW
    // it in UTF-16 code units (D83D < FFFD): a String.compareTo
    // tie-break would pick the wrong first merge here
    val docs = Seq((1L, "😀a �a")).toDF("doc_id", "text")
    val dist = graft.operators.BpeTokenizer.train(docs, 2)
      .merges.orderBy("rank").collect().map(_.toSeq).toSeq
    CacheScope.releaseAll()
    val local = graft.operators.BpeTokenizer
      .trainLocal(docs, 2, maxVocab = Int.MaxValue)
      .merges.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(local == dist && local.nonEmpty)
    assert(local.head(1) == "�",
      s"expected the byte-smaller U+FFFD pair to merge first, got $local")
  }

  test("trainLocal: merge tables are prefix-stable — more merges never " +
    "rewrite earlier ranks (incremental-extension contract)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val k8 = graft.operators.BpeTokenizer
      .trainLocal(docs, 8, maxVocab = Int.MaxValue)
      .merges.orderBy("rank").collect().map(_.toSeq).toSeq
    val k16 = graft.operators.BpeTokenizer
      .trainLocal(docs, 16, maxVocab = Int.MaxValue)
      .merges.orderBy("rank").collect().map(_.toSeq).toSeq
    // greedy determinism: extending the vocabulary budget only APPENDS
    // rules, so a persisted model can grow without invalidating
    // anything encoded against its prefix
    assert(k16.take(8) == k8 && k16.length > 8)
  }

  test("trainLocal: maxVocab truncation keeps the top words by (n DESC, word ASC)") {
    import spark.implicits._
    val docs = fixtureCorpus.toDF("doc_id", "text")
    val got = graft.operators.BpeTokenizer.trainLocal(docs, 8, maxVocab = 1)
      .merges.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // only "ab" (n=5) survives the cut: one merge, then fully merged
    assert(got == Seq((1, "a", "b", 5L)))
  }

  test("streaming bpeCountSink == batch encodeCounts across micro-batches " +
    "against a frozen reloaded artifact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe_stream").toString
    graft.operators.BpeTokenizer.save(
      graft.operators.BpeTokenizer.train(docs, 8), dir)
    CacheScope.releaseAll()
    val frozen = graft.operators.BpeTokenizer.load(spark, dir)
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStream.bpeCountSink(
      in.toDF().toDF("doc_id", "text"), frozen, s"$dir/out", s"$dir/ckpt")
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/out")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    val batch = graft.operators.BpeTokenizer.encodeCounts(docs, frozen)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("edges: empty corpus trains an empty table; empty-table encode is char segmentation") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val model = graft.operators.BpeTokenizer.train(empty, 3)
    assert(model.merges.count() == 0)
    CacheScope.releaseAll()
    val words = Seq("abc", "d").toDF("word")
    val enc = graft.operators.BpeTokenizer.encodeWords(words, model)
      .orderBy("word")
      .collect().map(r => (r.getString(0), r.getAs[Seq[String]]("syms"), r.getInt(2)))
    assert(enc.toSeq == Seq(("abc", Seq("a", "b", "c"), 3), ("d", Seq("d"), 1)))
  }
}
