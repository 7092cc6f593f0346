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
}
