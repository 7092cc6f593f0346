package graft

import graft.operators.{GraphDedup, TextDedup, TextFeatures}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The text → embedding bridge (operators/TextFeatures) and its
  * end-to-end semantic-dedup composition (r20). Pins: (1) the kernel
  * against a hand fixture; (2) on planted paraphrases, the semantic
  * verdict (bucket features → kNN graph → knnGraphDedup) agrees with
  * the lexical MinHash miner — every planted pair is semantically
  * grouped, every lexical candidate pair is a subset of the semantic
  * groups, and neither path groups unrelated docs. */
class TextFeaturesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  import spark.implicits._

  private def dot = graft.functions.DotProduct.column _

  test("unigramBucketVec: hand fixture — dense 256 buckets, exact " +
    "integer counts, one row per doc") {
    val docs = Seq((1L, "a b a"), (2L, "a")).toDF("doc_id", "text")
    val got = TextFeatures.unigramBucketVec(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Double](1).toArray, r.getLong(2)))).toMap
    // the bucket is the first md5 byte: md5("a")=0cc1..., md5("b")=92eb...
    val bA = Integer.parseInt("0c", 16)
    val bB = Integer.parseInt("92", 16)
    val (e1, n1) = got(1L)
    assert(e1.length == 256 && n1 == 3L)
    assert(e1(bA) == 2.0 && e1(bB) == 1.0)
    assert(e1.sum == 3.0, "all counts land in exactly one bucket")
    val (e2, n2) = got(2L)
    assert(e2(bA) == 1.0 && e2.sum == 1.0 && n2 == 1L)
    // bucket() matches the hex value for the full byte range
    val toks = (0 until 64).map(i => (i.toLong, s"tok$i"))
      .toDF("doc_id", "w")
    val pairs = toks
      .select(TextFeatures.bucket(col("w")).as("b"),
        expr("(instr('0123456789abcdef', substring(md5(w), 1, 1)) - 1) " +
          "* 16 + instr('0123456789abcdef', substring(md5(w), 2, 1)) - 1")
          .as("b2"))
      .collect()
    pairs.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  /** Brute-force exact cosine kNN graph over (doc_id, e) — the
    * doc_knn_dedup endpoint shape. */
  private def bruteGraph(v0: DataFrame, k: Int): DataFrame = {
    val v = v0.withColumn("norm", sqrt(dot(col("e"), col("e"))))
      .filter(col("norm") > 0)
    val q = broadcast(v.select(col("doc_id").as("query_id"),
      col("e").as("qe"), col("norm").as("qnorm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    v.select(col("doc_id").as("neighbor_id"), col("e"), col("norm"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("qcos",
        dot(col("e"), col("qe")) / (col("norm") * col("qnorm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "qcos")
  }

  test("planted paraphrases: the semantic text-dedup verdict agrees " +
    "with the lexical MinHash miner, and neither groups unrelated docs") {
    // 20 base docs of 40 words each from a 30-word vocabulary; docs
    // 100+i paraphrase doc i by substituting ONE word — the unigram
    // profile moves by one count, the shingle set by <= 3 shingles.
    // Seeded: the corpus (and both verdicts — md5 all the way down)
    // is fully deterministic.
    val vocab = (0 until 30).map(i => s"w$i")
    val rnd = new scala.util.Random(42)
    val base = (0 until 20).map { i =>
      (i.toLong, Array.fill(40)(vocab(rnd.nextInt(vocab.size))))
    }
    val paras = base.map { case (i, ws) =>
      val sub = ws.clone()
      sub(7) = vocab((vocab.indexOf(sub(7)) + 11) % vocab.size)
      (100L + i, sub)
    }
    val docs = (base ++ paras)
      .map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")

    // semantic path: bridge -> exact kNN graph -> mutual components
    val v = TextFeatures.unigramBucketVec(docs).select("doc_id", "e")
    val nodes = docs.select(col("doc_id").as("id"))
    val verdict = GraphDedup.knnGraphDedup(bruteGraph(v, 3), nodes,
      tau = 0.95)
    val comp = verdict.select("id", "component")
      .as[(Long, Long)].collect().toMap

    // every planted pair shares a component
    (0 until 20).foreach { i =>
      assert(comp(i.toLong) == comp(100L + i),
        s"paraphrase pair ($i, ${100 + i}) not grouped semantically")
    }
    // no unrelated pair is grouped: components are exactly the 20
    // planted pairs
    val sizes = verdict.groupBy("component").count()
      .select("count").as[Long].collect().sorted
    assert(sizes.toSeq == Seq.fill(20)(2L),
      s"expected 20 pairs, got group sizes ${sizes.toSeq}")

    // lexical path: the MinHash md5 miner on the same corpus
    val lex = TextDedup.minhashMd5Pairs(docs, n = 3, k = 16,
      bands = 4, tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // banding found every planted pair on this fixture (est_jaccard
    // ~0.9; deterministic md5 banding), and nothing else
    assert(lex == (0 until 20).map(i => (i.toLong, 100L + i)).toSet,
      s"lexical miner pairs: $lex")
    // agreement: every lexical candidate pair is semantically grouped
    lex.foreach { case (a, b) =>
      assert(comp(a) == comp(b),
        s"lexical pair ($a, $b) not in one semantic component")
    }
  }

  test("textSemanticAdmitSink: paraphrases of curated reference docs " +
    "are rejected on arrival, novel docs admitted; stream equals the " +
    "batch filter") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val tmps = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    def tmp(prefix: String): java.nio.file.Path = {
      val p = java.nio.file.Files.createTempDirectory(prefix)
      tmps += p; p
    }
    try {
      // curated reference corpus: 30 docs of 40 words
      val vocab = (0 until 30).map(i => s"w$i")
      val rnd = new scala.util.Random(11)
      def draw() = Array.fill(40)(vocab(rnd.nextInt(vocab.size)))
      val refWords = (0 until 30).map(i => (i.toLong, draw()))
      val refDocs = refWords
        .map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val refVecs = TextFeatures.unigramBucketVec(refDocs)
        .select(col("doc_id").as("vec_id"), col("e"))
      // exact-endpoint reference index over the bucket vectors
      // (kc >= corpus, one coarse cell: ADC == exact dot)
      val frozen = graft.operators.Similarity.ivfPqFit(refVecs,
        dim = 256, m = 16, kc = 64, kCoarse = 1, iters = 2)
      // arrivals: 5 one-word paraphrases of reference docs (cosine
      // ~0.975 >= tau - rejected) + 5 novel docs from FRESH tokens
      // (near-orthogonal - admitted)
      val paras = refWords.take(5).map { case (id, ws) =>
        val sub = ws.clone()
        sub(3) = vocab((vocab.indexOf(sub(3)) + 7) % vocab.size)
        (1000L + id, sub.mkString(" "))
      }
      val novel = (0 until 5).map(i =>
        (2000L + i, Array.fill(40)(s"z${rnd.nextInt(100000)}").mkString(" ")))
      val arrivals = paras ++ novel
      val outDir = tmp("tadmit_out"); val ckDir = tmp("tadmit_ck")
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.DocStream.textSemanticAdmitSink(
        in.toDF().toDF("doc_id", "text"), frozen, tau = 0.95,
        nprobe = 1, outDir.toString, ckDir.toString)
      try {
        val (b1, b2) = arrivals.splitAt(5)
        in.addData(b1); q.processAllAvailable()
        in.addData(b2); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.read.parquet(outDir.toString)
        .select("doc_id", "admit")
        .as[(Long, Boolean)].collect().toMap
      assert(streamed.size == 10)
      paras.foreach { case (id, _) =>
        assert(!streamed(id), s"paraphrase $id admitted") }
      novel.foreach { case (id, _) =>
        assert(streamed(id), s"novel doc $id rejected") }
      // stream == the one-shot batch filter through the shared core
      val batchVecs = TextFeatures.unigramBucketVec(
          arrivals.toDF("doc_id", "text"))
        .select(col("doc_id").as("vec_id"), col("e"))
      val batch = graft.streaming.EmbStream
        .admitVerdicts(batchVecs, frozen, tau = 0.95, nprobe = 1)
        .select(col("vec_id"), col("admit"))
        .as[(Long, Boolean)].collect().toMap
      assert(streamed == batch)
    } finally {
      CacheScope.releaseAll()
      tmps.foreach { p =>
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
  }

  test("refined admission on a LOSSY index equals the exact " +
    "brute-force gate (the production setting for a tight tau)") {
    val vocab = (0 until 30).map(i => s"w$i")
    val rnd = new scala.util.Random(23)
    def draw() = Array.fill(40)(vocab(rnd.nextInt(vocab.size)))
    val refWords = (0 until 200).map(i => (i.toLong, draw()))
    val refDocs = refWords
      .map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val refVecs = graft.CacheScope.persistTracked(
      TextFeatures.unigramBucketVec(refDocs)
        .select(col("doc_id").as("vec_id"), col("e")))
    try {
      // genuinely lossy: m=8 (32-dim subspaces), 16-entry codebooks
      val lossy = graft.operators.Similarity.ivfPqFit(refVecs,
        dim = 256, m = 8, kc = 16, kCoarse = 8, iters = 2)
      val arrivals = refWords.take(20).map { case (id, ws) =>
        val sub = ws.clone()
        sub(5) = vocab((vocab.indexOf(sub(5)) + 3) % vocab.size)
        (3000L + id, sub.mkString(" "))
      } ++ (0 until 20).map(i =>
        (4000L + i, Array.fill(40)(s"q${rnd.nextInt(100000)}").mkString(" ")))
      val arrVecs = graft.CacheScope.persistTracked(
        TextFeatures.unigramBucketVec(arrivals.toDF("doc_id", "text"))
          .select(col("doc_id").as("vec_id"), col("e")))
      val tau = 0.95
      val refined = graft.streaming.EmbStream.admitVerdicts(
          arrVecs, lossy, tau, nprobe = 8,
          refineWith = Some((refVecs, 20)))
        .select("vec_id", "admit")
        .as[(Long, Boolean)].collect().toMap
      // exact gate: admit iff no reference vector reaches tau
      val dot = graft.functions.DotProduct.column _
      val exact = arrVecs.select(col("vec_id"), col("e").as("qe"))
        .withColumn("qnorm", sqrt(dot(col("qe"), col("qe"))))
        .crossJoin(broadcast(refVecs.select(col("e"),
          sqrt(dot(col("e"), col("e"))).as("nrm"))))
        .withColumn("cos",
          dot(col("e"), col("qe")) / (col("nrm") * col("qnorm")))
        .groupBy("vec_id").agg(max(col("cos")).as("best"))
        .select(col("vec_id"), (col("best") < tau).as("admit"))
        .as[(Long, Boolean)].collect().toMap
      assert(refined == exact,
        s"refined != exact on ${refined.toSet.diff(exact.toSet)}")
      // and the gate is doing real work: all 20 paraphrases rejected,
      // all 20 novel docs admitted
      arrivals.take(20).foreach { case (id, _) => assert(!refined(id)) }
      arrivals.drop(20).foreach { case (id, _) => assert(refined(id)) }
    } finally CacheScope.releaseAll()
  }

  test("unrelated docs from the same vocabulary stay ungrouped at " +
    "the doc_knn_dedup threshold") {
    val vocab = (0 until 30).map(i => s"w$i")
    val rnd = new scala.util.Random(7)
    val docs = (0 until 40).map { i =>
      (i.toLong, Array.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val v = TextFeatures.unigramBucketVec(docs).select("doc_id", "e")
    val verdict = GraphDedup.knnGraphDedup(bruteGraph(v, 3),
      docs.select(col("doc_id").as("id")), tau = 0.95)
    assert(verdict.filter(!col("keep")).count() == 0L,
      "independent 40-word draws must not cross cos 0.95")
  }
}
