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
    val unknown = (ScaleClasses.demo.keySet ++ ScaleClasses.oracleQuadratic) -- qs
    assert(unknown.isEmpty, s"scale class names without a query: $unknown")
  }

  test("demo and oracle-quadratic are disjoint") {
    val both = ScaleClasses.demo.keySet.intersect(ScaleClasses.oracleQuadratic)
    assert(both.isEmpty, s"ambiguous class: $both")
  }

  test("sf0.001 is below the scale threshold (driver contract unchanged)") {
    val spark = SparkTest.extSpark
    assert(!ScaleClasses.aboveThreshold(spark, "/root/testdata/sf0.001"))
  }

  test("declaration JSON is well-formed either way") {
    for (above <- Seq(true, false)) {
      val s = ScaleClasses.declarationJson(above)
      // minimal structural check without a JSON lib: balanced and keyed
      assert(s.startsWith("{") && s.endsWith("}"))
      assert(s.contains("\"above_threshold\": " + above))
      assert(s.contains("\"demo\""))
      assert(s.contains("\"oracle_quadratic\""))
      ScaleClasses.demo.keys.foreach(k => assert(s.contains("\"" + k + "\"")))
    }
  }
}
