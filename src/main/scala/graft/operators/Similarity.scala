package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded random-hyperplane LSH near-dup mining — the parameterized
  * library form of the `emb_neardup` query (SURVEY §2c #42).
  *
  * A pair becomes a candidate iff its sign bits agree on at least one
  * band; every candidate is then verified with exact cosine. Precision
  * is therefore always 1.0; recall and candidate volume are set by the
  * banding knobs:
  *
  *   candidates ≈ bands × N² / 2^bitsPerBand   (uniform buckets)
  *   P(candidate | angle θ) = 1 − (1 − (1−θ/π)^bitsPerBand)^bands
  *
  * Narrow bands (4 bits) for moderate thresholds (τ ≈ 0.4); wide bands
  * (8–16 bits) once N grows or τ rises — at 100 TB the bucket count,
  * not the machine count, is what caps the in-bucket pair blowup. Only
  * (vec_id, band_idx, band_key) rows shuffle for candidate generation;
  * vectors are fetched once per VERIFIED candidate side, and nothing is
  * ever cartesian.
  */
object Similarity {

  /** Deterministic hyperplane components: murmur3 of (plane, dim)
    * scaled to [-1, 1). Driver-side literals — KBs broadcast with the
    * plan, reproducible across engines (the DuckDB oracle embeds the
    * same values). */
  def planes(nPlanes: Int, dim: Int): Seq[Array[Double]] =
    (0 until nPlanes).map { p =>
      Array.tabulate(dim) { j =>
        val h = scala.util.hashing.MurmurHash3.productHash((p, j))
        (math.floorMod(h, 2001) - 1000) / 1000.0
      }
    }

  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.column(a, b)

  /** Near-dup pairs with cosine ≥ tau from a vector table carrying
    * (vec_id, e: array<double>, norm) plus any `carry` columns, which
    * come back suffixed `_a`/`_b` on each side of every pair. */
  def lshNearDupPairs(v: DataFrame, dim: Int, bands: Int, bitsPerBand: Int,
      tau: Double, carry: Seq[String] = Nil): DataFrame = {
    val pl = planes(bands * bitsPerBand, dim)
    def bit(p: Int): Column =
      when(dot(col("e"), array(pl(p).map(lit): _*)) >= 0, 1).otherwise(0)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        (0 until bitsPerBand).map(i => bit(bitsPerBand * b + i) * (1 << i))
          .reduce(_ + _).as("band_key"))
    }
    val bandRows = v.select(col("vec_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("vec_id"), col("bs.band_idx").as("band_idx"),
        col("bs.band_key").as("band_key"))
    val cand = bandRows.as("a")
      .join(bandRows.as("b"), Seq("band_idx", "band_key"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    def side(suffix: String): DataFrame =
      v.select((Seq(col("vec_id").as(s"vec_$suffix"), col("e").as(s"e$suffix"),
        col("norm").as(s"n$suffix")) ++
        carry.map(c => col(c).as(s"${c}_$suffix"))): _*)
    cand.join(side("a"), "vec_a").join(side("b"), "vec_b")
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= tau)
      .select((Seq(col("vec_a"), col("vec_b"), col("cos")) ++
        carry.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b")))): _*)
  }
}
