package graft

import graft.operators.TextDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2c #37: the mined pair graph as a persisted artifact.
  * Mine-once must hold across sessions, not just within one
  * (QueryMemo's scope): write the graph to parquet, read it back
  * byte-equal, and drive the downstream dedup products off the
  * prebuilt graph with identical results and NO re-mining. */
class PairGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  private val d = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("pair graph round-trips; prebuilt graph drives clusters/canon without re-mining") {
    QueryMemo.clear()
    val mined = TextDedup.ngramJaccardPairs(
      Tables.documents(spark, d), n = 3, tau = 0.5)
    val minedRows = rows(mined)
    graft.CacheScope.releaseAll()
    assert(minedRows.nonEmpty)

    val dir = java.nio.file.Files.createTempDirectory("graft_pairs").toString
    TextDedup.writePairGraph(mined, dir)
    graft.CacheScope.releaseAll()
    assert(rows(TextDedup.readPairGraph(spark, dir)) == minedRows)

    // a non-graph path fails fast instead of joining garbage
    val bad = java.nio.file.Files.createTempDirectory("graft_notgraph").toString
    Tables.documents(spark, d).select("doc_id").limit(1)
      .write.mode("overwrite").parquet(bad)
    intercept[IllegalArgumentException](TextDedup.readPairGraph(spark, bad))

    // a graph mined under different parameters fails fast instead of
    // silently feeding every downstream product wrong pairs (the
    // sidecar check, ADVICE r12)
    val other = java.nio.file.Files.createTempDirectory("graft_othertau").toString
    TextDedup.writePairGraph(mined, other, n = 3, tau = 0.7)
    intercept[IllegalArgumentException](
      TextDedup.readPairGraph(spark, other, expectN = 3, expectTau = 0.5))
    // ... and a sidecar-less parquet of the right shape also fails
    val bare = java.nio.file.Files.createTempDirectory("graft_bare").toString
    mined.write.mode("overwrite").parquet(bare)
    intercept[IllegalArgumentException](TextDedup.readPairGraph(spark, bare))

    def products(): (Set[String], Set[String], Set[String]) = {
      val q = SparkEntry.queries
      try (
        rows(q("doc_dedup_clusters")(spark, d)),
        rows(q("doc_dedup_canon")(spark, d)),
        rows(q("doc_dedup_near")(spark, d)))
      finally graft.CacheScope.releaseAll()
    }

    QueryMemo.clear()
    val (clustersMined, canonMined, nearMined) = products()

    QueryMemo.clear()
    spark.conf.set("graft.dedup.pairGraphPath", dir)
    try {
      // the prebuilt plan must read the artifact, not re-shingle the
      // corpus (doc_ngram_jaccard IS the graph — clusters/canon consume
      // it through ConnectedComponents, whose iterative materialization
      // hides the leaf from their plans)
      val plan = QueryMemo.disabled(
        SparkEntry.queries("doc_ngram_jaccard")(spark, d)
          .queryExecution.executedPlan.toString)
      assert(plan.contains(new java.io.File(dir).getName), plan)
      assert(!plan.toLowerCase.contains("shingle"), plan)

      val (clustersPre, canonPre, nearPre) = products()
      assert(clustersPre == clustersMined)
      assert(canonPre == canonMined)
      assert(nearPre == nearMined)
    } finally {
      spark.conf.unset("graft.dedup.pairGraphPath")
      QueryMemo.clear()
    }
  }
}
