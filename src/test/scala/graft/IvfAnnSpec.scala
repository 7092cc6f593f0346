package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production IVF path (Similarity.ivfAnn — mergeable avg
  * centroids, no per-group value lists) must agree with the
  * oracle-exact emb_ann_ivf query (sequential-fold centroids) on the
  * verification corpus: avg and the ordered fold differ only in the
  * last bits of the centroid components, which must not flip any
  * assignment or rank here. */
class IvfAnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.extSpark
  private val d = "/root/testdata/sf0.001"

  test("Similarity.ivfAnn matches the oracle-exact query twin at sf0.001") {
    val v = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label").as("cluster_by"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(graft.functions.DotProduct.column(col("e"), col("e"))))
    val op = graft.operators.Similarity.ivfAnn(v, col("vec_id") < 5, 5)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val q = graft.queries.Embeddings.embAnnIvf(spark, d)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(op == q, s"operator-only: ${op -- q}; query-only: ${q -- op}")
  }

  test("a parquet round-tripped prebuilt index searches identically to the inline path") {
    // the index is an ARTIFACT: build once, persist, reload, search —
    // results must be bit-identical to composing index+search inline
    val v = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label").as("cluster_by"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(graft.functions.DotProduct.column(col("e"), col("e"))))
    val idxDir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    graft.operators.Similarity.ivfIndex(v).write.mode("overwrite").parquet(idxDir)
    val reloaded = spark.read.parquet(idxDir)
    val viaArtifact = graft.operators.Similarity
      .ivfSearch(v, reloaded, col("vec_id") < 5, 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val inline = graft.operators.Similarity
      .ivfAnn(v, col("vec_id") < 5, 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaArtifact == inline,
      s"artifact-only: ${viaArtifact -- inline}; inline-only: ${inline -- viaArtifact}")
    assert(inline.nonEmpty)
  }

  test("nprobe = #cells degenerates to exact brute-force top-k") {
    val v = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label").as("cluster_by"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(graft.functions.DotProduct.column(col("e"), col("e"))))
    val nCells = v.select("cluster_by").distinct().count().toInt
    val ann = graft.operators.Similarity
      .ivfAnn(v, col("vec_id") < 5, 5, nprobe = nCells)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force: every query against every other vector
    import org.apache.spark.sql.expressions.Window
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("norm").as("qnorm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val exact = v.select(col("vec_id").as("neighbor_id"), col("e"), col("norm"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", graft.functions.DotProduct.column(col("e"), col("qe"))
        / (col("norm") * col("qnorm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ann == exact, s"ann-only: ${ann -- exact}; exact-only: ${exact -- ann}")
  }

  test("nprobe > 1 cannot worsen any query's best neighbor") {
    val v = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label").as("cluster_by"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(graft.functions.DotProduct.column(col("e"), col("e"))))
    def best(np: Int): Map[Long, Double] = graft.operators.Similarity
      .ivfAnn(v, col("vec_id") < 5, 3, nprobe = np)
      .filter(col("rnk") === 1)
      .select("query_id", "cos").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b1 = best(1)
    val b2 = best(2)
    b1.foreach { case (qid, c1) =>
      assert(b2(qid) >= c1 - 1e-12, s"query $qid: ${b2(qid)} < $c1")
    }
  }
}
