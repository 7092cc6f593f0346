package graft

import graft.operators.{GraphDedup, KnnGraph, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2c: the kNN graph as a persisted, incrementally
  * maintained artifact. Pins, in order: (1) the save/load round trip
  * is consumer-invisible (GraphDedup over a reloaded graph ≡ over the
  * in-plan graph); (2) the NN-Descent merge-and-truncate equals a
  * full rebuild when the reverse fan-out covers the arrivals' true
  * reverse neighborhoods, and misses ONLY the documented asymmetric
  * class when it does not; (3) delta subtrees fold back losslessly
  * with honest staleness accounting; (4) the streaming sink's union
  * of per-batch deltas equals the one-shot batch append against the
  * same frozen base. */
class KnnGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  private val d = "/root/testdata/sf0.001"

  private def dot = graft.functions.DotProduct.column _

  private def vecs(cap: Long): DataFrame =
    Tables.embeddings(spark, d)
      .filter(col("vec_id") < cap)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))

  /** Exact brute-force kNN graph over `v` (query side = every row):
    * the rebuild baseline, same (qcos DESC, neighbor_id ASC) ranking
    * as the production search paths. */
  private def bruteGraph(v: DataFrame, k: Int): DataFrame = {
    val q = broadcast(v.select(col("vec_id").as("query_id"),
      col("e").as("qe"), col("norm").as("qnorm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    v.select(col("vec_id").as("neighbor_id"), col("e"), col("norm"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("qcos",
        dot(col("e"), col("qe")) / (col("norm") * col("qnorm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "qcos")
  }

  private def edgeSet(df: DataFrame): Set[(Long, Long, Int)] =
    df.select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def tmpDirs = scala.collection.mutable.ArrayBuffer
    .empty[java.nio.file.Path]

  private def rmAll(tmps: Seq[java.nio.file.Path]): Unit =
    tmps.foreach { p =>
      val walk = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }

  test("save/load round trip: stamped meta, identical edges, and a " +
    "GraphDedup consumer cannot tell the reloaded graph apart") {
    val tmps = tmpDirs
    try {
      val dir = java.nio.file.Files.createTempDirectory("knngraph")
      tmps += dir
      val v = vecs(30)
      val g = bruteGraph(v, 3)
      KnnGraph.save(g, k = 3, nprobe = 7, dir.toString)
      val loaded = KnnGraph.load(spark, dir.toString)
      assert(loaded.k == 3 && loaded.nprobe == 7)
      val meta = loaded.meta.collect()(0)
      assert(meta.getAs[Long]("n_nodes") == 30L)
      assert(meta.getAs[Long]("n_edges") == 90L)
      assert(meta.getAs[Long]("n_appended") == 0L)
      assert(edgeSet(loaded.edges) == edgeSet(g))
      val nodes = v.select(col("vec_id").as("id"))
      val direct = GraphDedup.knnGraphDedup(g, nodes, tau = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      val reloaded = GraphDedup.knnGraphDedup(loaded.edges, nodes,
          tau = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      assert(direct == reloaded)
      assert(!KnnGraph.needsRebuild(loaded), "fresh graph needs no rebuild")
    } finally rmAll(tmps.toSeq)
  }

  test("mergeEdges with covering reverse fan-out EQUALS the full " +
    "rebuild; with fan-out k the only misses are the documented " +
    "asymmetric-neighborhood class") {
    val k = 3
    val all = vecs(50)
    val base = all.filter(col("vec_id") < 40)
    val arrivals = all.filter(col("vec_id") >= 40)
    val baseG = bruteGraph(base, k)
    val rebuilt = bruteGraph(all, k)

    // forward lists of the arrivals over base ∪ arrivals, exact
    // scores; fullFwd lists EVERY node (covering fan-out), kFwd only
    // the arrivals' own top-k (the bounded production delta)
    def arrivalFwd(fanout: Int): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy(col("qcos").desc, col("neighbor_id").asc)
      all.select(col("vec_id").as("neighbor_id"), col("e"), col("norm"))
        .crossJoin(broadcast(arrivals.select(
          col("vec_id").as("query_id"), col("e").as("qe"),
          col("norm").as("qnorm"))))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("qcos",
          dot(col("e"), col("qe")) / (col("norm") * col("qnorm")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= fanout)
        .select("query_id", "neighbor_id", "rnk", "qcos")
    }

    val mergedFull = KnnGraph.mergeEdges(baseG, arrivalFwd(50), k)
    assert(edgeSet(mergedFull) == edgeSet(rebuilt),
      "covering fan-out must reproduce the rebuild exactly")
    // scores come through the identical dot arithmetic -> bitwise
    val qcosFull = mergedFull.select("query_id", "neighbor_id", "qcos")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    bruteGraph(all, k).select("query_id", "neighbor_id", "qcos")
      .collect().foreach { r =>
        assert(qcosFull((r.getLong(0), r.getLong(1))) == r.getDouble(2))
      }

    val mergedK = KnnGraph.mergeEdges(baseG, arrivalFwd(k), k)
    val gotK = edgeSet(mergedK).map { case (q, n, _) => (q, n) }
    val want = edgeSet(rebuilt).map { case (q, n, _) => (q, n) }
    // arrival rows are exact regardless of fan-out: their own top-k
    // IS the delta payload
    val arrivalsIds = (40L until 50L).toSet
    assert(gotK.filter(e => arrivalsIds(e._1)) ==
      want.filter(e => arrivalsIds(e._1)))
    // every miss is (existing u, arrival v) where v's bounded list
    // did not offer u — the asymmetric-neighborhood case the scaladoc
    // documents; no other divergence class is permitted
    val fwdPairs = arrivalFwd(k).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = want -- gotK
    missing.foreach { case (u, v) =>
      assert(!arrivalsIds(u) && arrivalsIds(v),
        s"unexpected miss class: ($u, $v)")
      assert(!fwdPairs((v, u)),
        s"($u, $v) missed although $v offered $u — a merge bug")
    }
    // and the merged graph never invents edges the rebuild lacks,
    // beyond base edges displaced into lower ranks... which truncation
    // forbids: spurious = kept base edges the rebuild evicted
    val spurious = gotK -- want
    spurious.foreach { case (u, v) =>
      assert(!arrivalsIds(u) && !arrivalsIds(v),
        s"spurious non-base edge: ($u, $v)")
    }
    assert(spurious.size == missing.size,
      "each missed arrival edge displaces exactly one stale base edge")
  }

  test("appendDelta + loadWithDeltas: batch_id subtrees fold back " +
    "losslessly, staleness meta counts arrival nodes, needsRebuild " +
    "thresholds fire; empty deltaDir loads the base unchanged") {
    val tmps = tmpDirs
    try {
      def tmp(p: String) = {
        val t = java.nio.file.Files.createTempDirectory(p); tmps += t; t
      }
      val k = 3
      val all = vecs(50)
      val base = all.filter(col("vec_id") < 40)
      val arrivals = all.filter(col("vec_id") >= 40)
      // exact-endpoint index over the full id space (kc >= n: every
      // residual its own centroid, ADC == exact dot), fit ONCE and
      // frozen; nprobe covers both coarse cells
      val idx = Similarity.ivfPqFit(all.select("vec_id", "e"),
        dim = 64, m = 8, kc = 64, kCoarse = 2, iters = 2)
      val gDir = tmp("kg_base")
      val dDir = tmp("kg_deltas")
      val baseG = bruteGraph(base, k)
      KnnGraph.save(baseG, k, nprobe = 2, gDir.toString)

      // no deltas yet: base unchanged
      val noD = KnnGraph.loadWithDeltas(spark, gDir.toString,
        dDir.toString + "/nonexistent")
      assert(edgeSet(noD.edges) == edgeSet(baseG))
      assert(noD.meta.collect()(0).getAs[Long]("n_appended") == 0L)

      KnnGraph.appendDelta(idx, arrivals.filter(col("vec_id") < 45),
        k, nprobe = 2, dDir.toString, batchId = 0L)
      KnnGraph.appendDelta(idx, arrivals.filter(col("vec_id") >= 45),
        k, nprobe = 2, dDir.toString, batchId = 1L)
      val folded = KnnGraph.loadWithDeltas(spark, gDir.toString,
        dDir.toString)
      // fold == the batch merge of the same forward edges
      val batchFwd = KnnGraph.forwardEdges(idx, arrivals, k, nprobe = 2)
      assert(edgeSet(folded.edges) ==
        edgeSet(KnnGraph.mergeEdges(baseG, batchFwd, k)))
      // arrivals' rows are the exact top-k (exact-endpoint index)
      val arrivalRows = edgeSet(folded.edges).filter(_._1 >= 40L)
      val exactRows = edgeSet(bruteGraph(all, k)).filter(_._1 >= 40L)
      assert(arrivalRows == exactRows)
      // staleness: 10 arrival nodes on a 40-node base
      assert(folded.meta.collect()(0).getAs[Long]("n_appended") == 10L)
      assert(!KnnGraph.needsRebuild(folded, maxAppendFraction = 0.5))
      assert(KnnGraph.needsRebuild(folded, maxAppendFraction = 0.2))
      // replay safety: rewriting batch 1 changes nothing (materialize
      // the pre-replay fold first — the overwrite replaces the files
      // its lazy plan would otherwise re-read)
      val foldedSet = edgeSet(folded.edges)
      KnnGraph.appendDelta(idx, arrivals.filter(col("vec_id") >= 45),
        k, nprobe = 2, dDir.toString, batchId = 1L)
      val again = KnnGraph.loadWithDeltas(spark, gDir.toString,
        dDir.toString)
      assert(edgeSet(again.edges) == foldedSet)

      // budget-stamp guard (r20): a delta searched at a different
      // k/nprobe than the base graph's stamp must be rejected at
      // load, not silently folded
      val badDir = tmp("kg_bad_deltas")
      KnnGraph.appendDelta(idx, arrivals, k, nprobe = 1,
        badDir.toString, batchId = 0L)
      val e1 = intercept[IllegalArgumentException] {
        KnnGraph.loadWithDeltas(spark, gDir.toString, badDir.toString)
      }
      assert(e1.getMessage.contains("nprobe=1"))
      // an unstamped (hand-built / pre-r20) delta is rejected too
      val rawDir = tmp("kg_raw_deltas")
      batchFwd.write.mode("overwrite")
        .parquet(rawDir.toString + "/batch_id=0")
      val e2 = intercept[IllegalArgumentException] {
        KnnGraph.loadWithDeltas(spark, gDir.toString, rawDir.toString)
      }
      assert(e2.getMessage.contains("stamp"))
      // mergeEdges rejects a malformed forward frame by name
      val e3 = intercept[IllegalArgumentException] {
        KnnGraph.mergeEdges(baseG,
          batchFwd.withColumnRenamed("qcos", "score"), k)
      }
      assert(e3.getMessage.contains("forward frame"))
    } finally {
      CacheScope.releaseAll()
      rmAll(tmps.toSeq)
    }
  }

  test("knnGraphAppendSink: union of per-micro-batch deltas equals " +
    "the one-shot batch append against the same frozen base") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val tmps = tmpDirs
    try {
      def tmp(p: String) = {
        val t = java.nio.file.Files.createTempDirectory(p); tmps += t; t
      }
      val k = 3
      val all = vecs(50)
      val base = all.filter(col("vec_id") < 40)
      val arrivals = all.filter(col("vec_id") >= 40)
      val idx = Similarity.ivfPqFit(base.select("vec_id", "e"),
        dim = 64, m = 8, kc = 64, kCoarse = 2, iters = 2)
      // freeze through the artifact, like every streaming spec
      val idxDir = tmp("kg_idx")
      Similarity.saveIvfPqIndex(idx, idxDir.toString)
      CacheScope.releaseAll()
      val frozen = Similarity.loadIvfPqIndex(spark, idxDir.toString)

      val rows = arrivals.select("vec_id", "e").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
      val dDir = tmp("kg_sink_deltas")
      val ckDir = tmp("kg_sink_ck")
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val q = graft.streaming.EmbStream.knnGraphAppendSink(
        in.toDF().toDF("vec_id", "e"), frozen, k, nprobe = 2,
        dDir.toString, ckDir.toString)
      try {
        val (b1, b2) = rows.splitAt(5)
        in.addData(b1.toSeq); q.processAllAvailable()
        in.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()

      val streamed = edgeSet(spark.read.parquet(dDir.toString)
        .select("query_id", "neighbor_id", "rnk", "qcos"))
      val batch = edgeSet(
        KnnGraph.forwardEdges(frozen, arrivals, k, nprobe = 2))
      assert(streamed == batch,
        s"stream-only: ${streamed -- batch}, batch-only: ${batch -- streamed}")
    } finally {
      CacheScope.releaseAll()
      rmAll(tmps.toSeq)
    }
  }
}
