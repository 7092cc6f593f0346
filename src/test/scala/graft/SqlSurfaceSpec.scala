package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-first consumers: temp views + spark.sql + the registered custom
  * functions must express the same pipelines the Column API does. */
class SqlSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark

  test("the engine is drivable from pure SQL, custom functions included") {
    graft.functions.GraftFunctions.register(spark)
    Tables.events(spark, "/root/testdata/sf0.001").createOrReplaceTempView("ev")
    Tables.documents(spark, "/root/testdata/sf0.001").createOrReplaceTempView("docs")

    // reference-style routing metric in SQL
    val counts = spark.sql(
      """SELECT event_type, COUNT(*) AS n FROM ev GROUP BY 1""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("click", "view", "purchase", "signup", "error"))

    // sessionization in SQL (lag + cumulative sum)
    val sessions = spark.sql(
      """SELECT user_id, SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS n_sessions
        |FROM (SELECT user_id,
        |        unix_timestamp(ts) - lag(unix_timestamp(ts))
        |          OVER (PARTITION BY user_id ORDER BY event_id) AS gap
        |      FROM ev) g
        |GROUP BY 1""".stripMargin).count()
    assert(sessions > 0)

    // the custom simhash64 expression from SQL
    val sigs = spark.sql(
      "SELECT doc_id, simhash64(split(text, ' ')) AS sig FROM docs")
      .collect()
    assert(sigs.length == spark.table("docs").count() &&
      sigs.map(_.getLong(1)).distinct.length > 1)

    // the SQ8 kernel family from SQL: decode(codes, mn, scale) must
    // reproduce the roundtrip grid bit-for-bit, arity errors are
    // analysis-time
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("emb")
    val badRt = spark.sql(
      """SELECT COUNT(*) AS n FROM (
        |  SELECT sq8_roundtrip(e) AS rt,
        |    sq8_decode(sq8_codes(e), sq8_stats(e)[0],
        |      (sq8_stats(e)[1] - sq8_stats(e)[0]) / 255.0) AS dc
        |  FROM (SELECT CAST(embedding AS array<double>) AS e FROM emb))
        |WHERE rt <> dc""".stripMargin).head().getLong(0)
    assert(badRt == 0, s"$badRt SQL sq8 decodes diverge from the roundtrip")
    val arityErr = intercept[Exception](spark.sql("SELECT sq8_codes(1, 2)"))
    assert(arityErr.getMessage.contains("sq8_codes requires exactly 1"))

    // the n-gram kernels from SQL: instances preserve multiplicity and
    // order, shingles are their distinct set; n must be a literal
    val grams = spark.sql(
      """SELECT ngram_instances(split('a b a b', ' '), 2) AS inst,
        |       shingle_ngrams(split('a b a b', ' '), 2) AS sh""".stripMargin)
      .head()
    assert(grams.getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(grams.getSeq[String](1) == Seq("a b", "b a"))
    val litErr = intercept[Exception](
      spark.sql("SELECT ngram_instances(split('a b', ' '), doc_id) FROM docs"))
    assert(litErr.getMessage.contains("literal"), litErr.getMessage)

    // the k-means/PQ assignment kernel from SQL: argmin by
    // see − 2·dot + scc, ties toward the lower cluster id
    val nc = spark.sql(
      """SELECT nearest_code(
        |  array(named_struct('cluster', 1, 'ce', array(0.0d, 0.0d), 'scc', 0.0d),
        |        named_struct('cluster', 0, 'ce', array(1.0d, 0.0d), 'scc', 1.0d),
        |        named_struct('cluster', 2, 'ce', array(1.0d, 0.0d), 'scc', 1.0d)),
        |  array(1.0d, 0.0d), 1.0d) AS best""".stripMargin).head()
      .getStruct(0)
    assert(nc.getInt(0) == 0 && nc.getDouble(1) == 0.0, nc.toString)
    val ncErr = intercept[Exception](spark.sql("SELECT nearest_code(1)"))
    assert(ncErr.getMessage.contains("nearest_code requires exactly 3"))
  }
}
