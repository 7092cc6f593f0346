package graft

import graft.queries.Scoring
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen quality-model artifact: a parquet round trip scores
  * bit-identically, scoring against the self-trained model reproduces
  * the qualityClassifier query's per-source rollup exactly, and the
  * streaming sink's per-batch union equals the one-shot batch score
  * over the same docs (parity by construction — the model is fixed). */
class QualityModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  private def docs: DataFrame = Tables.documents(spark, d)

  private def cleanup(ps: Seq[java.nio.file.Path]): Unit =
    ps.foreach { p =>
      val walk = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }

  test("parquet round trip scores bit-identically; reloaded-model " +
    "predictions reproduce the self-scored query rollup") {
    val dir = java.nio.file.Files.createTempDirectory("qmodel")
    try {
      val model = Scoring.trainQualityModel(docs)
      // pre-save scores FIRST (the in-session model), then reload and
      // compare — a save/load perturbation of wv or bv must fail here
      val a = Scoring.scoreWithQualityModel(docs, model)
        .collect().map(r => (r.getLong(0),
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          r.getBoolean(2))).toSet
      Scoring.saveQualityModel(model, dir.toString)
      CacheScope.releaseAll()
      val re = Scoring.loadQualityModel(spark, dir.toString)
      val b = Scoring.scoreWithQualityModel(docs, re)
        .collect().map(r => (r.getLong(0),
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          r.getBoolean(2))).toSet
      assert(a == b)
      // reloaded-model agreement rollup == the query's rollup
      val viaModel = Scoring.scoreWithQualityModel(docs, re)
        .join(graft.queries.Docs.gopherMetrics(docs)
          .select(col("doc_id"),
            when(col("keep"), 1.0).otherwise(-1.0).as("y")), "doc_id")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("y") > 0, 1L).otherwise(0L)).as("n_teacher_keep"),
          sum(when(col("pred"), 1L).otherwise(0L)).as("n_pred_keep"),
          sum(when((col("y") > 0) === col("pred"), 1L).otherwise(0L))
            .as("n_agree"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val viaQuery = Scoring.qualityClassifier(docs)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(viaModel == viaQuery)
    } finally {
      CacheScope.releaseAll()
      cleanup(Seq(dir))
    }
  }

  test("streaming sink: per-batch union equals the one-shot batch " +
    "score from the same frozen artifact") {
    implicit val sql = spark.sqlContext
    val idxDir = java.nio.file.Files.createTempDirectory("qmodel_idx")
    val outDir = java.nio.file.Files.createTempDirectory("qmodel_out")
    val ckDir = java.nio.file.Files.createTempDirectory("qmodel_ck")
    try {
      Scoring.saveQualityModel(Scoring.trainQualityModel(docs),
        idxDir.toString)
      CacheScope.releaseAll()
      val frozen = Scoring.loadQualityModel(spark, idxDir.toString)
      val rows = docs.select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.DocStream.qualityScoreSink(
        in.toDF().toDF("doc_id", "text"), frozen,
        outDir.toString, ckDir.toString)
      try {
        val (b1, b2) = rows.splitAt(rows.length / 2)
        in.addData(b1.toSeq); q.processAllAvailable()
        in.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.read.parquet(outDir.toString)
        .select("doc_id", "score", "pred")
        .collect().map(r => (r.getLong(0),
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          r.getBoolean(2))).toSet
      val batch = Scoring.scoreWithQualityModel(
          docs.select("doc_id", "text"), frozen)
        .collect().map(r => (r.getLong(0),
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          r.getBoolean(2))).toSet
      assert(streamed == batch,
        s"stream-only: ${streamed -- batch}, batch-only: ${batch -- streamed}")
      assert(streamed.nonEmpty)
    } finally {
      CacheScope.releaseAll()
      cleanup(Seq(idxDir, outDir, ckDir))
    }
  }

  private def modelBits(m: Scoring.QualityModel) = (
    m.weights.collect().map(r => (r.getString(0),
      java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
      java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
      java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSet,
    java.lang.Double.doubleToRawLongBits(
      m.bias.collect()(0).getDouble(0)))

  test("qcAppend: append-then-derive is bit-equal to a retrain on " +
    "the union (weights, bias, and every score)") {
    try {
      val cut = docs.agg(
        expr("percentile(doc_id, 0.5)")).collect()(0).getDouble(0)
      val a = docs.filter(col("doc_id") <= cut)
      val b = docs.filter(col("doc_id") > cut)
      assert(a.count() > 0 && b.count() > 0)
      val appended = Scoring.qualityFromCounts(
        Scoring.qcAppend(Scoring.qcCounts(a), b))
      val retrained = Scoring.trainQualityModel(docs)
      assert(modelBits(appended) == modelBits(retrained))
      val sa = Scoring.scoreWithQualityModel(docs, appended)
        .collect().map(r => (r.getLong(0),
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          r.getBoolean(2))).toSet
      val sr = Scoring.scoreWithQualityModel(docs, retrained)
        .collect().map(r => (r.getLong(0),
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          r.getBoolean(2))).toSet
      assert(sa == sr && sa.nonEmpty)
    } finally CacheScope.releaseAll()
  }

  test("qcAppend: counts survive a parquet round trip; watermark " +
    "violations fail fast; empty increments are no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("qcounts")
    try {
      val cut = docs.agg(
        expr("percentile(doc_id, 0.5)")).collect()(0).getDouble(0)
      val a = docs.filter(col("doc_id") <= cut)
      val b = docs.filter(col("doc_id") > cut)
      Scoring.saveQualityCounts(Scoring.qcCounts(a), dir.toString)
      CacheScope.releaseAll()
      val re = Scoring.loadQualityCounts(spark, dir.toString)
      val viaDisk = Scoring.qualityFromCounts(Scoring.qcAppend(re, b))
      assert(modelBits(viaDisk) ==
        modelBits(Scoring.trainQualityModel(docs)))
      // an increment at-or-below the watermark cannot absorb exactly
      val ex = intercept[IllegalArgumentException] {
        Scoring.qcAppend(re, a)
      }
      assert(ex.getMessage.contains("watermark"))
      // empty increment: unchanged counts object
      val same = Scoring.qcAppend(re, b.filter(lit(false)))
      assert(same.eq(re))
    } finally {
      CacheScope.releaseAll()
      cleanup(Seq(dir))
    }
  }

  test("streaming qcCountsSink: doc_id-ordered micro-batches absorb " +
    "into versioned counts whose latest version derives a model " +
    "bit-equal to a retrain over everything absorbed") {
    val dir = java.nio.file.Files.createTempDirectory("qc_stream_cnt")
    try {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val all = docs.select("doc_id", "text")
      val rows = all.collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.DocStream.qcCountsSink(
        in.toDF().toDF("doc_id", "text"), s"$dir/state", s"$dir/ckpt")
      try {
        rows.grouped(rows.length / 3 + 1).foreach { b =>
          in.addData(b.toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      val versions = new java.io.File(s"$dir/state").list()
        .filter(_.matches("v\\d+")).map(_.drop(1).toLong).sorted
      assert(versions.length >= 3, s"expected >=3 versions, got ${versions.toSeq}")
      val latest = Scoring.loadQualityCounts(spark,
        s"$dir/state/v${versions.last}")
      assert(modelBits(Scoring.qualityFromCounts(latest)) ==
        modelBits(Scoring.trainQualityModel(all)))
    } finally {
      CacheScope.releaseAll()
      cleanup(Seq(dir))
    }
  }
}
