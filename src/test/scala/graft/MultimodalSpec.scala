package graft

import graft.multimodal._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2c #47: multimodal opaque-binary columns — schema,
  * encoders, per-partition decode plumbing, frame fan-out. The decode
  * kernel is a deterministic stub (no codec libs in this container). */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark
  import spark.implicits._

  private def media(n: Int): Seq[Media] =
    (0 until n).map { i =>
      val bytes = Array.tabulate[Byte](100 + i * 37)(j => ((i * 131 + j) % 251).toByte)
      Media(i.toLong, if (i % 2 == 0) "image" else "audio", bytes,
        width = 640 + i, height = 480, sample_rate = 16000)
    }

  test("extractFeatures: schema, determinism, one pass per partition") {
    val ds = spark.createDataset(media(8)).repartition(3)
    val feats = Multimodal.extractFeatures(ds, dim = 16).collect()
      .sortBy(_.media_id)
    assert(feats.length == 8)
    assert(feats.forall(_.features.length == 16))
    // deterministic: same input -> identical features + checksum
    val again = Multimodal.extractFeatures(ds, dim = 16).collect()
      .sortBy(_.media_id)
    assert(feats.zip(again).forall { case (a, b) =>
      a.checksum == b.checksum && a.features.sameElements(b.features)
    })
    // n_bytes survives the decode step
    assert(feats.map(_.n_bytes).toSeq == media(8).map(_.bytes.length))
  }

  test("sampleFrames fans out one row per stride window") {
    val ds = spark.createDataset(media(4))
    val frames = Multimodal.sampleFrames(ds, strideBytes = 64).collect()
    val expected = media(4).map(m => math.max(1, m.bytes.length / 64)).sum
    assert(frames.length == expected)
    // offsets are stride-aligned and frame indices are dense per media
    assert(frames.forall(f => f.offset == f.frame_idx * 64))
  }

  test("resizeMeta caps the longest side, payload untouched") {
    val ds = spark.createDataset(media(4))
    val resized = Multimodal.resizeMeta(ds, maxSide = 320).collect()
      .sortBy(_.media_id)
    assert(resized.forall(m => math.max(m.width, m.height) <= 320))
    assert(resized.zip(media(4)).forall { case (r, o) =>
      r.bytes.sameElements(o.bytes)
    })
  }
}
