package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the declarative scale-class surface (VERDICT r12 item 2): the
  * class members exist as queries, the demo/oracle-quadratic sets stay
  * disjoint, the tiny test corpora sit below the threshold (so the
  * driver's sf0.01 contract is unchanged), and the declaration JSON
  * parses.
  */
class ScaleClassesSpec extends AnyFunSuite {

  test("every classified name is a declared query") {
    val qs = SparkEntry.queries.keySet
    val unknown = (ScaleClasses.demo.keySet ++ ScaleClasses.oracleQuadratic ++
      ScaleClasses.minerScale.keySet) -- qs
    assert(unknown.isEmpty, s"scale class names without a query: $unknown")
  }

  test("demo and miner tiers are disjoint (one exclusion reason each)") {
    val both = ScaleClasses.demo.keySet.intersect(ScaleClasses.minerScale.keySet)
    assert(both.isEmpty, s"ambiguous tier: $both")
  }

  test("the scale path of the e2e pipeline is NOT scale-classed out") {
    // doc_pipeline_scale exists precisely to survive where the exact
    // variant is excluded — it must never join a Spark-side exclusion
    // tier, and the exact variant must be in the miner tier
    assert(!ScaleClasses.demo.contains("doc_pipeline_scale"))
    assert(!ScaleClasses.minerScale.contains("doc_pipeline_scale"))
    assert(ScaleClasses.minerScale.contains("doc_pipeline_e2e"))
  }

  test("tier thresholds are ordered: demo decade below miner decade") {
    assert(ScaleClasses.maxDemoDocs < ScaleClasses.maxMinerDocs)
  }

  test("sf0.001 is below the scale threshold (driver contract unchanged)") {
    val spark = SparkTest.extSpark
    assert(!ScaleClasses.aboveThreshold(spark, "/root/testdata/sf0.001"))
    assert(ScaleClasses.exclusions(spark, "/root/testdata/sf0.001").isEmpty)
  }

  test("declaration JSON is well-formed either way") {
    for (above <- Seq(true, false)) {
      val excluded = if (above) ScaleClasses.demo ++ ScaleClasses.minerScale
                     else Map.empty[String, String]
      val s = ScaleClasses.declarationJson(above, excluded)
      // minimal structural check without a JSON lib: balanced and keyed
      assert(s.startsWith("{") && s.endsWith("}"))
      assert(s.contains("\"above_threshold\": " + above))
      assert(s.contains("\"demo\""))
      assert(s.contains("\"oracle_quadratic\""))
      assert(s.contains("\"miner_scale\""))
      excluded.keys.foreach(k => assert(s.contains("\"" + k + "\"")))
    }
  }
}
