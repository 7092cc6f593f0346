package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom sort-merge as-of operator (LogicalPlan + Strategy + Exec)
  * must match a reference as-of computed independently, across
  * partitioning schemes, and must plan as a sort-merge (no broadcast of
  * the big right side). */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.extSpark
  import spark.implicits._

  // events: (user, etime, eid); states: (user, stime, version)
  private def events = (1 to 2000).map { i =>
    (i % 50L, (i * 13 % 997).toLong, i.toLong)
  }.toDF("user_id", "etime", "event_id").repartition(7)

  private def states = (1 to 600).map { i =>
    (i % 40L, (i * 29 % 900).toLong, i.toLong)
  }.toDF("s_user_id", "stime", "version")
    // dedupe ties on (user, time): as-of is defined for unique times
    .groupBy("s_user_id", "stime").agg(max("version").as("version"))
    .repartition(5)

  private def viaOperator = AsOfJoin.join(
    events, states, "user_id", "etime", "s_user_id", "stime")
    .select("event_id", "user_id", "etime", "stime", "version")

  /** Reference: plain join + keep latest stime ≤ etime via window. */
  private def viaWindowTrick = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("stime").desc)
    events.join(states,
        col("user_id") === col("s_user_id") && col("stime") <= col("etime"),
        "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "etime", "stime", "version")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3),
      if (r.isNullAt(4)) -1L else r.getLong(4))).sortBy(_._1).toSeq

  test("matches the window-trick reference, including unmatched rows") {
    val got = canon(viaOperator)
    val want = canon(viaWindowTrick)
    assert(got.length == 2000)
    assert(got == want)
  }

  test("plans as sort-merge shape: clustered exchange + sort, no broadcast") {
    val plan = viaOperator.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // SparkPlan.nodeName strips "Exec"
    assert(plan.contains("Sort"), plan)
    assert(!plan.contains("BroadcastExchange"), plan)
  }

  test("handles empty right partitions and right side smaller than partition count") {
    // one-user right side: after hash clustering most right partitions
    // are empty — every left row in those partitions takes the null path
    val tinyStates = states.filter(col("s_user_id") === 3L)
    val out = AsOfJoin.join(events, tinyStates,
      "user_id", "etime", "s_user_id", "stime")
      .select("event_id", "user_id", "version")
    val rows = out.collect()
    assert(rows.length == 2000)
    val matched = rows.filter(!_.isNullAt(2))
    assert(matched.forall(_.getLong(1) == 3L))
    assert(rows.filter(_.isNullAt(2)).nonEmpty)
  }

  test("integer key/time columns are widened, not crashed on") {
    import spark.implicits._
    // int columns: the exec evals Long; construction must widen (a
    // task-time ClassCastException was the old failure mode)
    val l = Seq((1, 10, 100L), (2, 20, 101L)).toDF("k", "t", "payload")
    val r = Seq((1, 5, 7L)).toDF("rk", "rt", "version")
    val out = AsOfJoin.join(l, r, "k", "t", "rk", "rt")
      .select("payload", "version").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(out == Set((100L, 7L), (101L, -1L)))
    // non-integral types fail fast with a named column
    val bad = intercept[IllegalArgumentException] {
      AsOfJoin.join(l.withColumn("k", col("k").cast("string")), r, "k", "t", "rk", "rt")
    }
    assert(bad.getMessage.contains("'k'"))
  }

  test("result is independent of input partitioning") {
    val a = canon(AsOfJoin.join(events.repartition(1), states.repartition(1),
      "user_id", "etime", "s_user_id", "stime")
      .select("event_id", "user_id", "etime", "stime", "version"))
    assert(a == canon(viaOperator))
  }
}
