package graft

import graft.queries.Scoring
import graft.streaming.DocStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-LM artifact path and the streaming admission gates:
  * train-once/score-forever must reproduce the self-scored query
  * bit-for-bit on the training corpus, survive a parquet round trip,
  * back off finitely on unseen text, and the streaming twins must
  * match their batch contracts across micro-batch splits. */
class LmStreamDomainCapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("scoreWithLm against the self-trained model == lmScore, bit for bit") {
    try {
      val docs = Tables.documents(spark, d).select("doc_id", "text")
      val got = Scoring.scoreWithLm(docs, Scoring.lmTrain(docs))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val want = Scoring.lmScore(Tables.documents(spark, d))
        .select("doc_id", "n_bigrams", "nll")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got.size == want.size && got.nonEmpty)
      assert(got == want)
    } finally CacheScope.releaseAll()
  }

  test("incremental counts: lmFromCounts(lmMerge(A, B)) == lmTrain(A ∪ B) " +
    "bit-for-bit (the additive-maintenance contract)") {
    try {
      val docs = Tables.documents(spark, d).select("doc_id", "text")
      val a = docs.filter(col("doc_id") % 2 === 0)
      val b = docs.filter(col("doc_id") % 2 =!= 0)
      val merged = Scoring.lmFromCounts(
        Scoring.lmMerge(Scoring.lmCounts(a), Scoring.lmCounts(b)))
      val retrain = Scoring.lmTrain(docs)
      def bg(m: Scoring.LmModel) = m.bigrams.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      def hd(m: Scoring.LmModel) = m.heads.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(merged.vocab.collect()(0).getLong(0) ==
        retrain.vocab.collect()(0).getLong(0))
      assert(bg(merged) == bg(retrain)) // logp doubles bit-equal
      assert(hd(merged) == hd(retrain))
      // and scoring against the merged model == scoring against retrain
      val sa = Scoring.scoreWithLm(docs, merged)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val sb = Scoring.scoreWithLm(docs, retrain)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(sa == sb && sa.nonEmpty)
    } finally CacheScope.releaseAll()
  }

  test("LmModel survives a parquet round trip (persisted-artifact contract)") {
    try {
      val docs = Tables.documents(spark, d).select("doc_id", "text")
      val lm = Scoring.lmTrain(docs)
      val dir = java.nio.file.Files.createTempDirectory("lm_model").toString
      lm.bigrams.write.mode("overwrite").parquet(s"$dir/bigrams")
      lm.heads.write.mode("overwrite").parquet(s"$dir/heads")
      lm.vocab.write.mode("overwrite").parquet(s"$dir/vocab")
      val reloaded = Scoring.LmModel(
        spark.read.parquet(s"$dir/bigrams"),
        spark.read.parquet(s"$dir/heads"),
        spark.read.parquet(s"$dir/vocab"))
      val a = Scoring.scoreWithLm(docs, lm)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val b = Scoring.scoreWithLm(docs, reloaded)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(a == b)
    } finally CacheScope.releaseAll()
  }

  test("unseen bigrams back off finitely and rank worse than seen text") {
    try {
      val train = Seq((1L, "a b a b a b"), (2L, "a b c d")).toDF("doc_id", "text")
      val lm = Scoring.lmTrain(train)
      val score = Scoring.scoreWithLm(Seq(
        (10L, "a b a b"),   // all bigrams seen, the dominant one
        (11L, "a q q z"),   // seen head 'a', unseen bigrams
        (12L, "zz qq xx")). // nothing seen at all
        toDF("doc_id", "text"), lm)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(score.values.forall(java.lang.Double.isFinite))
      // the dominant seen bigram beats any backoff path
      assert(score(10L) < score(11L) && score(10L) < score(12L), score.toString)
      // fully-unseen backoff is the closed form ln(V) exactly (V = 4:
      // a, b, c, d). Note add-one's quirk: the unseen-HEAD path 1/V is
      // MORE probable than a seen head's backoff 1/(c1+V) — c1 only
      // grows the denominator — so no ordering between 11 and 12 is
      // asserted; the model family (CCNet uses interpolated KN) owns
      // that choice, the operator owns finiteness + the formula
      assert(score(12L) == math.log(4.0), score.toString)
    } finally CacheScope.releaseAll()
  }

  test("streaming lmScoreSink == batch scoreWithLm across micro-batches") {
    try {
      implicit val sql = spark.sqlContext
      val docs = Tables.documents(spark, d).select("doc_id", "text")
      val lm = Scoring.lmTrain(docs)
      // freeze the model tables: a foreachBatch re-plans its subtree
      // every micro-batch, and the artifact contract is a STATIC model
      val dir = java.nio.file.Files.createTempDirectory("lm_stream").toString
      lm.bigrams.write.parquet(s"$dir/bigrams")
      lm.heads.write.parquet(s"$dir/heads")
      lm.vocab.write.parquet(s"$dir/vocab")
      val frozen = Scoring.LmModel(
        spark.read.parquet(s"$dir/bigrams"),
        spark.read.parquet(s"$dir/heads"),
        spark.read.parquet(s"$dir/vocab"))
      val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val in = MemoryStream[(Long, String)]
      val q = DocStream.lmScoreSink(in.toDF().toDF("doc_id", "text"),
        frozen, s"$dir/out", s"$dir/ckpt")
      try {
        val (b1, b2) = rows.splitAt(rows.length / 2)
        in.addData(b1.toSeq); q.processAllAvailable()
        in.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.read.parquet(s"$dir/out")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
      val batch = Scoring.scoreWithLm(docs, frozen)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(streamed == batch)
    } finally CacheScope.releaseAll()
  }

  test("streaming lmCountsSink: delta-absorbed counts derive a model " +
    "bit-equal to lmTrain over everything the stream has seen") {
    try {
      implicit val sql = spark.sqlContext
      val docs = Tables.documents(spark, d).select("doc_id", "text")
      val rows = docs.collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val dir = java.nio.file.Files.createTempDirectory("lm_cnt_stream").toString
      val in = MemoryStream[(Long, String)]
      val q = DocStream.lmCountsSink(in.toDF().toDF("doc_id", "text"),
        s"$dir/deltas", s"$dir/ckpt")
      try {
        rows.grouped(rows.length / 3 + 1).foreach { b =>
          in.addData(b.toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      val absorbed = Scoring.lmFromCounts(
        Scoring.lmCountsFromDeltas(spark, s"$dir/deltas"))
      def bits(m: Scoring.LmModel) = Scoring.scoreWithLm(docs, m)
        .collect().map(r => r.getLong(0) -> (r.getLong(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).toMap
      val sa = bits(absorbed)
      val sr = bits(Scoring.lmTrain(docs))
      assert(sa.nonEmpty && sa == sr)
    } finally CacheScope.releaseAll()
  }

  test("streaming domain cap: per-source admission matches the " +
    "arrival-order batch rank across micro-batches") {
    implicit val sql = spark.sqlContext
    val docs = Tables.documents(spark, d).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val verdicts = DocStream.domainCapVerdicts(
      in.toDF().toDF("doc_id", "source"), cap = 3)
    val q = verdicts.writeStream.outputMode("append")
      .format("memory").queryName("cap_verdicts").start()
    try {
      docs.grouped(docs.length / 3 + 1).foreach { b =>
        in.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("cap_verdicts")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("admitted"), r.getAs[Long]("seq"))).toMap
    val w = Window.partitionBy("source").orderBy("doc_id")
    val want = Tables.documents(spark, d).select("doc_id", "source")
      .withColumn("seq", row_number().over(w))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("seq") <= 3, r.getAs[Int]("seq").toLong)).toMap
    assert(got.size == want.size)
    assert(got == want)
    assert(got.values.exists(!_._1), "cap never rejected; test is vacuous")
  }
}
