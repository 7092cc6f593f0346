package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net: the properties that make these queries
  * scale (scan pushdown, column pruning, broadcast dims, no cartesian
  * blowups) must survive refactors — a correct-but-full-scan plan is a
  * silent failure at 100 TB. */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.extSpark
  private val d = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("q2_filter_project: predicate pushdown + column pruning reach the scan") {
    val p = planOf("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    // pruned read schema: only the filter + projection columns
    assert(p.contains("l_orderkey") && !p.contains("l_extendedprice"), p)
  }

  test("q9_multi_join: all dims broadcast, no sort-merge of dims") {
    val p = planOf("q9_multi_join")
    assert(p.split("BroadcastHashJoin").length >= 4, p)
  }

  test("evt_route: route table broadcast, event side never shuffles for the join") {
    val p = planOf("evt_route")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("evt_asof: interval dim broadcast (no shuffle of events)") {
    val p = planOf("evt_asof")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("emb_cosine_topk: query side broadcast") {
    val p = planOf("emb_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("doc queries stay free of cartesian products") {
    Seq("doc_ngram_jaccard", "doc_minhash_lsh", "doc_simhash").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("emb_neardup (bucketed) has no cartesian / unconditioned BNLJ") {
    val p = planOf("emb_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("doc_minhash_lsh carries no forced broadcast of the candidate set") {
    // the candidate-pair cardinality is data-dependent (quadratic in
    // bucket skew): a broadcast HINT would pin it onto every executor
    // regardless of size — strategy choice must stay with AQE
    val df = SparkEntry.queries("doc_minhash_lsh")(spark, d)
    val logical = df.queryExecution.optimizedPlan.toString
    assert(!logical.contains("strategy=broadcast"), logical)
  }

  test("whole-stage codegen covers the scan->filter->project paths") {
    // "*(n)" prefixes mark whole-stage-codegen stages in plan toString
    val p = planOf("q2_filter_project")
    assert(p.contains("*(1)"), p)
  }
}
