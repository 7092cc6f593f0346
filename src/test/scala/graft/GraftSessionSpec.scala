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

  test("as-of planner strategy survives a pre-existing session (ensure path)") {
    SparkTest.spark // extensions-less session exists first
    val s = GraftSession.local(4)
    import s.implicits._
    // a plan that only AsOfJoinStrategy can execute
    val left = Seq((1L, 10L), (1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 5L, "a"), (1L, 15L, "b")).toDF("k", "rt", "v")
    val joined = graft.plans.AsOfJoin.join(left, right,
      leftKey = "k", leftTime = "t", rightKey = "k", rightTime = "rt")
    val got = joined.select("t", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((10L, "a"), (20L, "b")))
  }

  test("repetition_stats SQL misuse fails with a clear message") {
    val s = GraftSession.local(4)
    val e1 = intercept[Exception](
      s.sql("SELECT repetition_stats(array('a'))").collect())
    assert(e1.getMessage.contains("exactly 2 arguments"), e1.getMessage)
    val e2 = intercept[Exception](s.sql(
      "SELECT repetition_stats(array('a'), id) FROM range(3)").collect())
    assert(e2.getMessage.contains("literal"), e2.getMessage)
  }
}
