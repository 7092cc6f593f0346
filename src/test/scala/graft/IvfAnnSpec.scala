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
}
