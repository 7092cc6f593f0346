package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2c #42c': SemDeDup over real centroid assignments. On a
  * label-separated seeded corpus (per-label direction spike + bounded
  * deterministic noise), nearest-centroid assignment must recover the
  * labels exactly, making three formulations agree row for row:
  * label-clustered (the emb_semdedup baseline), sequential-fold
  * centroid-clustered (the emb_semdedup_ivf oracle twin), and the
  * production mergeable-centroid path (Similarity.ivfIndex +
  * semDedup), including a parquet round trip of the index — the
  * persisted-artifact story. */
class SemdedupIvfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark

  // 4 labels x 25 vectors, 16 dims: spike 3.4 on dim=label (dims 0-3
  // are spike-only, so every vector is orthogonal to every OTHER
  // label's centroid and nearest-centroid assignment is exact by
  // construction), murmur3-seeded noise in [-2, 2] on dims 4-15 —
  // within-label cosines land ~0.42 +- 0.17, straddling tau=0.4
  // (some kept, some dropped); cross-label cosines ~0.
  private def corpus: DataFrame = {
    import spark.implicits._
    val rows = for { l <- 0 until 4; i <- 0 until 25 } yield {
      val id = (l * 25 + i).toLong
      val e = Array.tabulate(16) { j =>
        val spike = if (j == l) 3.4 else 0.0
        val noise = if (j >= 4) {
          val h = scala.util.hashing.MurmurHash3.productHash((id, j))
          (math.floorMod(h, 2001) - 1000) / 500.0
        } else 0.0
        spike + noise
      }
      (id, l, e)
    }
    rows.toDF("vec_id", "label", "e")
      .withColumn("norm",
        sqrt(graft.functions.DotProduct.column(col("e"), col("e"))))
  }

  private def keyed(df: DataFrame, cluster: String): Set[(Int, Long, Long, Long)] = {
    import spark.implicits._
    df.select(col(cluster).cast("int"), col("n_total"), col("n_kept"),
        col("n_dropped"))
      .as[(Int, Long, Long, Long)].collect().toSet
  }

  test("nearest sequential-fold centroid recovers the seeded labels exactly") {
    import spark.implicits._
    val got = graft.queries.Embeddings.seqFoldAssigned(corpus)
      .select(col("vec_id"), col("cluster").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 100)
    got.foreach { case (id, cl) => assert(cl == id / 25, s"vec $id -> $cl") }
  }

  test("label-clustered == centroid-clustered == production semDedup (+ index round trip)") {
    val v = corpus
    val byLabel = keyed(Similarity.semDedupWithin(v, "label", tau = 0.4), "label")
    // the pruning is non-degenerate: some cluster keeps >1 and drops >=1
    assert(byLabel.exists(r => r._3 > 1), byLabel.toString)
    assert(byLabel.exists(r => r._4 >= 1), byLabel.toString)

    val byCent = keyed(Similarity.semDedupWithin(
      graft.queries.Embeddings.seqFoldAssigned(v), "cluster", tau = 0.4),
      "cluster")
    assert(byCent == byLabel)

    val idx = Similarity.ivfIndex(v.withColumn("cluster_by", col("label")))
    val byProd = keyed(Similarity.semDedup(v, idx, tau = 0.4), "cluster")
    assert(byProd == byLabel)

    // the index is a persistable artifact: parquet round trip changes nothing
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    idx.write.mode("overwrite").parquet(dir)
    val byRoundTrip = keyed(
      Similarity.semDedup(v, spark.read.parquet(dir), tau = 0.4), "cluster")
    assert(byRoundTrip == byLabel)
  }
}
