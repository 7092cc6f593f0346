package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: codes stay in range, compression is real
  * (m bytes of codes per vector), the provably-exact endpoint
  * (kc ≥ #distinct subvectors ⇒ ADC ≡ brute force) holds, the index
  * survives a parquet round trip with stamped parameters, and recall
  * at a lossy setting is measured, not assumed. */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  private val d = "/root/testdata/sf0.001"

  private def vecs: DataFrame =
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  private def queries(v: DataFrame, nQ: Int): DataFrame =
    broadcast(v.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
      .withColumn("qnorm",
        sqrt(graft.functions.DotProduct.column(col("qe"), col("qe")))))

  /** Exact cosine top-k (query_id, neighbor_id, rnk) — the baseline. */
  private def exactTopK(v: DataFrame, nQ: Int, k: Int): Set[(Long, Long, Int)] = {
    val dotc = graft.functions.DotProduct.column _
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    v.select(col("vec_id").as("neighbor_id"), col("e"),
        sqrt(dotc(col("e"), col("e"))).as("norm"))
      .crossJoin(queries(v, nQ))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dotc(col("e"), col("qe")) / (col("norm") * col("qnorm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("codes are m ints in [0, kc); cluster usage is non-degenerate") {
    try {
      val idx = Similarity.pqFit(vecs, dim = 64, m = 8, kc = 16, iters = 2)
      val bad = idx.codes.filter(size(col("codes")) =!= 8 ||
        exists(col("codes"), c => c < 0 || c >= 16)).count()
      assert(bad == 0)
      // every subspace uses more than one code on real data
      val usage = idx.codes
        .select(posexplode(col("codes")).as(Seq("s", "code")))
        .groupBy("s").agg(countDistinct("code").as("u"))
        .collect().map(r => r.getAs[Long]("u"))
      assert(usage.forall(_ > 1), usage.mkString(","))
    } finally CacheScope.releaseAll()
  }

  test("provably-exact endpoint: kc >= corpus size + iters=1 reproduces " +
    "brute-force cosine top-k exactly") {
    try {
      val v = vecs
      val idx = Similarity.pqFit(v, dim = 64, m = 8, kc = 500, iters = 1)
      val got = Similarity.pqSearch(idx, queries(v, 5), k = 5)
        .select("query_id", "neighbor_id", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == exactTopK(v, 5, 5))
    } finally CacheScope.releaseAll()
  }

  test("parquet round trip: reloaded index is search-identical and " +
    "carries its stamped parameters") {
    try {
      val v = vecs
      val idx = Similarity.pqFit(v, dim = 64, m = 8, kc = 16, iters = 2)
      val dir = java.nio.file.Files.createTempDirectory("pq_idx").toString
      Similarity.savePqIndex(idx, dir)
      val re = Similarity.loadPqIndex(spark, dir)
      assert(re.m == 8 && re.dim == 64)
      val a = Similarity.pqSearch(idx, queries(v, 5), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val b = Similarity.pqSearch(re, queries(v, 5), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(a == b)
    } finally CacheScope.releaseAll()
  }

  test("load fails fast on a codes/meta width mismatch (ADVICE r15: " +
    "stamped meta alone cannot catch a mixed-artifact dir)") {
    try {
      val v = vecs
      val idx = Similarity.pqFit(v, dim = 64, m = 8, kc = 16, iters = 1)
      val dir = java.nio.file.Files.createTempDirectory("pq_bad").toString
      Similarity.savePqIndex(idx, dir)
      // overwrite codes with a different-m artifact: meta still says 8
      val idx4 = Similarity.pqFit(v, dim = 64, m = 4, kc = 16, iters = 1)
      idx4.codes.write.mode("overwrite").parquet(s"$dir/codes")
      val e = intercept[IllegalArgumentException] {
        Similarity.loadPqIndex(spark, dir)
      }
      assert(e.getMessage.contains("stamped m=8"), e.getMessage)
    } finally CacheScope.releaseAll()
  }

  test("non-dense vec_id space seeds correctly (ADVICE r15: offset ids " +
    "must not produce an empty codebook)") {
    try {
      // shift every id by 1000: under the old `vec_id < kc` seeding the
      // codebook would be EMPTY and every assignment the sentinel
      val v = vecs.withColumn("vec_id", col("vec_id") + 1000L)
      val idx = Similarity.pqFit(v, dim = 64, m = 4, kc = 8, iters = 1)
      assert(idx.codebooks.count() > 0)
      // code labels are seed RANKS — they must stay inside [0, kc)
      // even when the ids themselves are far larger
      val bad = idx.codes.filter(size(col("codes")) =!= 4 ||
        exists(col("codes"), c => c < 0 || c >= 8)).count()
      assert(bad == 0)
    } finally CacheScope.releaseAll()
  }

  test("pqAppend: re-appending stripped rows reproduces the fit's own code " +
    "rows bit-for-bit, searches identically, and stamps staleness") {
    try {
      val v = vecs
      val full = Similarity.pqFit(v, dim = 64, m = 8, kc = 16, iters = 3)
      val fullCodes = graft.CacheScope.persistTracked(full.codes)
      def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Seq[Int], Double)] =
        df.collect().map(r => (r.getLong(0), r.getSeq[Int](1),
          r.getDouble(2))).toSet
      val fullRows = rows(fullCodes)
      val sub = full.copy(codes = fullCodes.filter(col("vec_id") < 400))
      val app = Similarity.pqAppend(sub, v.filter(col("vec_id") >= 400))
      assert(rows(app.codes) == fullRows)
      def pairs(idx: Similarity.PqIndex): Set[(Long, Long)] =
        Similarity.pqSearch(idx, queries(v, 5), k = 5)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs(app) == pairs(full))
      assert(app.meta.select("n_appended").collect()(0).getLong(0) == 100L)
    } finally CacheScope.releaseAll()
  }

  test("lossy recall at m=8 kc=16 is measured and nontrivial") {
    try {
      val v = vecs
      val idx = Similarity.pqFit(v, dim = 64, m = 8, kc = 16, iters = 3)
      val got = Similarity.pqSearch(idx, queries(v, 5), k = 10)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = exactTopK(v, 5, 10).map(t => (t._1, t._2))
      val recall = got.count(exact.contains).toDouble / exact.size
      info(f"pq m=8 kc=16 recall@10 = $recall%.3f")
      assert(recall >= 0.2, f"recall $recall%.3f collapsed")
    } finally CacheScope.releaseAll()
  }

  test("refine exact endpoint: kShort >= corpus reproduces brute-force " +
    "top-k exactly even over a hard-lossy index") {
    try {
      val v = vecs
      // kc = 4 quantizes brutally — the shortlist covers the whole
      // corpus, so the exact re-rank must recover brute force no
      // matter how bad the ADC ordering underneath was
      val idx = Similarity.pqFit(v, dim = 64, m = 8, kc = 4, iters = 1)
      val got = Similarity.pqSearchRefine(idx, queries(v, 5), v,
          k = 5, kShort = 1000)
        .select("query_id", "neighbor_id", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == exactTopK(v, 5, 5))
    } finally CacheScope.releaseAll()
  }

  test("refine: results come from the ADC shortlist and carry the EXACT " +
    "cosine bit-for-bit; recall never drops below the unrefined search") {
    try {
      val dotc = graft.functions.DotProduct.column _
      val v = vecs
      val idx = Similarity.pqFit(v, dim = 64, m = 8, kc = 8, iters = 1)
      val q = queries(v, 5)
      val short = Similarity.pqSearch(idx, q, k = 50)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val refined = Similarity.pqSearchRefine(idx, q, v, k = 10, kShort = 50)
      val refRows = refined.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      assert(refRows.forall(t => short.contains((t._1, t._2))))
      // qcos must be the exact cosine, not the ADC approximation:
      // recompute independently with the brute-force arithmetic
      val exactCos = v.select(col("vec_id").as("neighbor_id"), col("e"),
          sqrt(dotc(col("e"), col("e"))).as("norm"))
        .crossJoin(q)
        .withColumn("cos", dotc(col("e"), col("qe")) / (col("norm") * col("qnorm")))
        .select(col("query_id"), col("neighbor_id"), col("cos"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      refRows.foreach { case (qid, nid, qcos) =>
        assert(java.lang.Double.doubleToLongBits(qcos) ==
          java.lang.Double.doubleToLongBits(exactCos((qid, nid))),
          s"($qid,$nid): refined $qcos != exact ${exactCos((qid, nid))}")
      }
      val exact = exactTopK(v, 5, 10).map(t => (t._1, t._2))
      def recall(got: Set[(Long, Long)]): Double =
        got.count(exact.contains).toDouble / exact.size
      val adc = Similarity.pqSearch(idx, q, k = 10)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rAdc = recall(adc)
      val rRef = recall(refRows.map(t => (t._1, t._2)).toSet)
      info(f"kc=8 recall@10: adc $rAdc%.3f -> refined(kShort=50) $rRef%.3f")
      assert(rRef >= rAdc, f"refine dropped recall: $rAdc%.3f -> $rRef%.3f")
    } finally CacheScope.releaseAll()
  }

  test("refine plan: raw vectors join the broadcast shortlist IN PLACE — " +
    "the only exchange above the candidate join is the final rank " +
    "window over nQ*kShort rows") {
    try {
      val v = vecs
      val dir = java.nio.file.Files.createTempDirectory("pqr_plan").toString
      Similarity.savePqIndex(
        Similarity.pqFit(v, dim = 64, m = 8, kc = 8, iters = 1), dir)
      CacheScope.releaseAll()
      val idx = Similarity.loadPqIndex(spark, dir)
      val p = Similarity.pqSearchRefine(idx, queries(v, 5), v,
          k = 5, kShort = 20)
        .queryExecution.executedPlan.toString
      // refine segment = everything above the first BroadcastHashJoin
      // (the shortlist/query sides print below it): exactly the final
      // rank window's ONE exchange, and NO scan — the raw vectors
      // feed the join in place, never hash-shuffled on vec_id
      val joinAt = p.indexOf("BroadcastHashJoin")
      assert(joinAt > 0, p)
      val refineSide = p.substring(0, joinAt)
      assert("Exchange hashpartitioning".r.findAllIn(refineSide).size == 1, p)
      assert(!refineSide.contains("FileScan"), p)
      assert(!p.contains("SortMergeJoin (vec_id"), p)
    } finally CacheScope.releaseAll()
  }

  test("refine rejects kShort < k") {
    val v = vecs
    val idx = Similarity.pqFit(v, dim = 64, m = 8, kc = 4, iters = 1)
    val e = intercept[IllegalArgumentException] {
      Similarity.pqSearchRefine(idx, queries(v, 2), v, k = 10, kShort = 5)
    }
    assert(e.getMessage.contains("kShort"), e.getMessage)
    CacheScope.releaseAll()
  }
}
