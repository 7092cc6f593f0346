package graft

import org.scalatest.funsuite.AnyFunSuite

/** The consumer entry point: GraftSession.local must yield a session
  * where the library's SQL functions and scale defaults are live even
  * when an earlier session already exists (the getOrCreate-ignores-
  * extensions trap). */
class GraftSessionSpec extends AnyFunSuite {

  test("local() registers SQL functions on a pre-existing session") {
    SparkTest.spark // force the shared session to exist first
    val s = GraftSession.local(4)
    val r = s.sql(
      "SELECT repetition_stats(array('a','a','b'), 1).top_count AS t")
      .collect()(0).getInt(0)
    assert(r == 2)
    val sh = s.sql("SELECT simhash64(array('x','y')) AS h").collect()(0)
    assert(!sh.isNullAt(0))
  }

  test("scale defaults are applied") {
    val s = GraftSession.local(4)
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")
  }
}
