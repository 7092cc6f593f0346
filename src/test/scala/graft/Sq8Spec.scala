package graft

import graft.functions.Sq8
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 quantization kernel: grid-error bounds, reference-implementation
  * parity, null semantics, and the compressed-index recall vs the exact
  * cosine probe. */
class Sq8Spec extends AnyFunSuite {

  lazy val spark = SparkTest.spark
  private val d = "/root/testdata/sf0.001"

  test("max_abs_err bounded by the grid step, sse by dims*step^2") {
    val viol = graft.queries.Embeddings.embQuantize(spark, d)
      .withColumn("step", (col("mx") - col("mn")) / 255.0)
      // err_i = u - floor(u/step)*step < step up to 1-ulp rounding
      .filter(col("max_abs_err") > col("step") * 1.0000001 ||
        col("sse") > lit(64.0) * col("step") * col("step") * 1.0000001)
      .count()
    assert(viol == 0, s"$viol vectors exceed the SQ8 grid-error bound")
  }

  test("constant vector quantizes with zero error; mn = mx") {
    import spark.implicits._
    val df = Seq(Tuple1(Array.fill(8)(3.14))).toDF("e")
    val Row(mn: Double, mx: Double, sse: Double, mae: Double) = df
      .select(Sq8.statsColumn(col("e")).as("st"))
      .select(element_at(col("st"), 1), element_at(col("st"), 2),
        element_at(col("st"), 3), element_at(col("st"), 4))
      .head()
    assert(mn == 3.14 && mx == 3.14 && sse == 0.0 && mae == 0.0)
  }

  test("roundtrip matches an independent reference implementation bit-for-bit") {
    val rows = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).limit(50).collect()
    val got = Tables.embeddings(spark, d).limit(50)
      .select(col("vec_id"),
        Sq8.roundtripColumn(col("embedding").cast("array<double>")).as("dq"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val x = r.getSeq[Float](1).map(_.toDouble).toArray
      val mn = x.min
      val mx = x.max
      val scale = (mx - mn) / 255.0
      val want = x.map { v =>
        val code = if (scale == 0.0) 0.0
          else math.min(math.floor((v - mn) / scale), 255.0)
        mn + code * scale
      }
      assert(got(r.getLong(0)) == want.toSeq, s"vec ${r.getLong(0)}")
    }
  }

  test("null semantics: empty array and null element yield NULL") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array.empty[Double])),
      (2L, Some(Array(1.0, 2.0))),
      (3L, None)).toDF("id", "e")
      .withColumn("e2", when(col("id") === 2, array(lit(1.0),
        lit(null).cast("double"))).otherwise(col("e")))
    val out = df.select(col("id"),
      Sq8.roundtripColumn(col("e2")).as("rt"),
      Sq8.statsColumn(col("e2")).as("st")).collect()
      .map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out(1L) == ((true, true)), "empty array must be NULL")
    assert(out(2L) == ((true, true)), "null element must be NULL")
    assert(out(3L) == ((true, true)), "null array must be NULL")
  }

  test("non-finite elements are refused (NULL), never silently coded") {
    // NaN has no grid code: the roundtrip would propagate NaN while the
    // int8 path would have to invent a byte (decoding to mn — a silent
    // value substitution). All kernels refuse the vector instead.
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0, Double.NaN, 1.0)),
      (2L, Array(0.0, Double.PositiveInfinity)),
      (3L, Array(0.0, 0.5, 1.0))).toDF("id", "e")
    val out = df.select(col("id"),
      Sq8.roundtripColumn(col("e")).as("rt"),
      Sq8.statsColumn(col("e")).as("st"),
      Sq8.codesColumn(col("e")).as("c")).collect()
      .map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2), r.isNullAt(3)))
      .toMap
    assert(out(1L) == ((true, true, true)), "NaN element must be NULL")
    assert(out(2L) == ((true, true, true)), "Inf element must be NULL")
    assert(out(3L) == ((false, false, false)), "finite vector must pass")
  }

  test("decode∘codes equals the roundtrip kernel bit-for-bit") {
    val v = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val viol = v.select(
      Sq8.roundtripColumn(col("e")).as("rt"),
      Sq8.decodeColumn(Sq8.codesColumn(col("e")),
        element_at(Sq8.statsColumn(col("e")), 1),
        (element_at(Sq8.statsColumn(col("e")), 2) -
          element_at(Sq8.statsColumn(col("e")), 1)) / 255.0).as("dc"))
      .filter(col("rt") =!= col("dc")).count()
    assert(viol == 0, s"$viol vectors decode differently from the roundtrip")
  }

  test("sq8Index parquet round trip searches identically; symmetric mode equals emb_ann_sq") {
    import graft.operators.Similarity
    val v = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val idx = Similarity.sq8Index(v)
    // codes really are int8 at rest
    assert(idx.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false))
    val dir = java.nio.file.Files.createTempDirectory("sq8idx").toString
    idx.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    // symmetric mode: decoded queries == the emb_ann_sq query twin
    def decodedQueries(i: org.apache.spark.sql.DataFrame) =
      i.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
        Sq8.decodeColumn(col("codes"), col("mn"), col("scale")).as("qe"),
        col("dnorm").as("qnorm"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    val fresh = rows(Similarity.sq8Search(idx, decodedQueries(idx), 5))
    val rt = rows(Similarity.sq8Search(reloaded, decodedQueries(reloaded), 5))
    val twin = rows(graft.queries.Embeddings.embAnnSq(spark, d))
    assert(fresh == rt, "parquet round trip changed search results")
    assert(fresh == twin, "symmetric sq8Search diverges from emb_ann_sq")
  }

  test("quantized ANN agrees with the exact cosine probe on most of top-5") {
    val exact = graft.queries.Embeddings.embCosineTopk(spark, d)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val sq = graft.queries.Embeddings.embAnnSq(spark, d)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(exact.keySet == sq.keySet)
    val overlap = exact.keys.toSeq.map { q =>
      (exact(q) & sq(q)).size.toDouble / exact(q).size
    }
    val recall = overlap.sum / overlap.size
    assert(recall >= 0.6,
      s"SQ8 top-5 recall $recall below 0.6 (per-query: $overlap)")
  }
}
