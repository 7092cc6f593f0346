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

  test("PnmCodec: P5/P6 encode-decode round trip is identity") {
    import graft.multimodal.{PnmCodec, Raster}
    val gray = Raster(4, 3, 1, Array.tabulate(12)(i => (i * 21) % 256))
    val rgb = Raster(3, 2, 3, Array.tabulate(18)(i => (255 - i * 13 % 256)))
    for (r <- Seq(gray, rgb)) {
      val back = PnmCodec.decode(PnmCodec.encode(r))
      assert(back.isDefined)
      assert(back.get.width == r.width && back.get.height == r.height &&
        back.get.channels == r.channels)
      assert(back.get.pixels.sameElements(r.pixels), r)
    }
  }

  test("PnmCodec: header comments and multi-whitespace parse; every " +
    "malformed class returns None, never a partial raster") {
    import graft.multimodal.PnmCodec
    // comments + mixed whitespace are legal Netpbm headers
    val commented = ("P5 # magic\n# a comment line\n 4\t3 #dims\n255\n"
      .getBytes("US-ASCII")) ++ Array.fill(12)(7.toByte)
    val ok = PnmCodec.decode(commented)
    assert(ok.exists(r => r.width == 4 && r.height == 3 &&
      r.pixels.forall(_ == 7)))
    val good = PnmCodec.encode(
      graft.multimodal.Raster(2, 2, 1, Array(1, 2, 3, 4)))
    assert(PnmCodec.decode(good).isDefined)
    val bad = Seq[Array[Byte]](
      null,
      Array[Byte](),
      "Px\n2 2\n255\n".getBytes("US-ASCII") ++ Array.fill(4)(0.toByte),
      "P7\n2 2\n255\n".getBytes("US-ASCII") ++ Array.fill(4)(0.toByte),
      "P5\n0 2\n255\n".getBytes("US-ASCII") ++ Array.fill(4)(0.toByte),
      "P5\n2 2\n65535\n".getBytes("US-ASCII") ++ Array.fill(8)(0.toByte),
      good.dropRight(1), // truncated payload
      "P5\n2 2\n255\n".getBytes("US-ASCII")) // no payload at all
    bad.foreach(b => assert(PnmCodec.decode(b).isEmpty,
      s"decoded malformed input: ${if (b == null) "null" else b.length}"))
  }

  test("PnmCodec.resizeNearest: hand-computed 4x2 -> 2x2 fixture and " +
    "channel preservation on RGB") {
    import graft.multimodal.{PnmCodec, Raster}
    // src 4x2: rows [0 1 2 3] [4 5 6 7]; dst (x,y) reads
    // src(floor(x*4/2), floor(y*2/2)) = (2x, y) -> [0 2] [4 6]
    val r = PnmCodec.resizeNearest(
      Raster(4, 2, 1, Array(0, 1, 2, 3, 4, 5, 6, 7)), 2, 2)
    assert(r.pixels.sameElements(Array(0, 2, 4, 6)), r.pixels.toSeq)
    // RGB: each sample triple moves as a unit
    val rgb = Raster(2, 1, 3, Array(10, 11, 12, 20, 21, 22))
    val up = PnmCodec.resizeNearest(rgb, 4, 1)
    assert(up.pixels.sameElements(
      Array(10, 11, 12, 10, 11, 12, 20, 21, 22, 20, 21, 22)))
  }

  test("decodeStats and resizePixels: real pixels flow end to end; " +
    "an undecodable payload yields the dead-letter shape") {
    import graft.multimodal.{Media, Multimodal, PnmCodec, Raster}
    import spark.implicits._
    val img = PnmCodec.encode(Raster(4, 2, 1, Array(0, 1, 2, 3, 4, 5, 6, 7)))
    val ds = Seq(
      Media(1L, "image", img, 4, 2, 0),
      Media(2L, "image", "not an image".getBytes("US-ASCII"), 0, 0, 0))
      .toDS()
    val st = Multimodal.decodeStats(ds).collect().sortBy(_.media_id)
    assert(st(0).decoded && st(0).n_pixels == 8 && st(0).px_sum == 28L &&
      st(0).px_min == 0 && st(0).px_max == 7)
    assert(!st(1).decoded && st(1).n_pixels == 0)
    val rs = Multimodal.resizePixels(ds, 2, 2).collect().sortBy(_.media_id)
    assert(rs(0).pixels == "0,2,4,6")
    assert(rs(1).pixels == "")
  }
}
