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

  test("gridFeatureVec: hand-computed fixtures — even and uneven " +
    "patch splits, per-image centering") {
    import graft.multimodal.{Multimodal, Raster}
    // 4x2 -> 2x2 grid: patches {0,1}/{2,3}/{4,5}/{6,7}, means
    // 0.5/2.5/4.5/6.5, global mean 3.5 -> centered [-3,-1,1,3]
    val r = Raster(4, 2, 1, Array(0, 1, 2, 3, 4, 5, 6, 7))
    assert(Multimodal.gridFeatureVec(r, 2, 2).toSeq ==
      Seq(-3.0, -1.0, 1.0, 3.0))
    // uneven 5x3 -> 2x2: y splits [0,1)/[1,3), x splits [0,2)/[2,5);
    // all-constant raster centers to exactly zero everywhere
    val flat = Raster(5, 3, 1, Array.fill(15)(9))
    assert(Multimodal.gridFeatureVec(flat, 2, 2).toSeq ==
      Seq(0.0, 0.0, 0.0, 0.0))
    // RGB pools channels: 2x2x3 -> 1x2 grid (one patch per column)
    val rgb = Raster(2, 2, 3,
      Array(0, 0, 0, 30, 30, 30, 10, 10, 10, 40, 40, 40))
    val f = Multimodal.gridFeatureVec(rgb, 2, 1)
    assert(f.toSeq == Seq(5.0 - 20.0, 35.0 - 20.0))
    // grid larger than the raster is a contract violation
    intercept[IllegalArgumentException] {
      Multimodal.gridFeatureVec(r, 8, 8)
    }
  }

  test("embedMedia + knnGraphDedup: planted near-identical images " +
    "land in one component; unrelated images stay singletons") {
    import graft.multimodal.{Media, Multimodal, PnmCodec, Raster}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def img(f: (Int, Int) => Int): Array[Byte] =
      PnmCodec.encode(Raster(16, 8, 1,
        Array.tabulate(128)(i => f(i % 16, i / 16) & 0xff)))
    val gradient = img((x, y) => x * 8 + y * 4)
    val gradientTweak = { // one pixel nudged: near-dup, not identical
      val r = PnmCodec.decode(gradient).get
      val px = r.pixels.clone(); px(37) += 2
      PnmCodec.encode(Raster(16, 8, 1, px))
    }
    // block-checker at PATCH scale (4x2 blocks): a pixel-scale
    // checkerboard would mean-pool to a constant raster (zero-norm
    // centered vector, correctly dropped from the graph)
    val checker = img((x, y) => if ((x / 4 + y / 2) % 2 == 0) 20 else 200)
    val checkerTweak = {
      val r = PnmCodec.decode(checker).get
      val px = r.pixels.clone(); px(90) -= 3
      PnmCodec.encode(Raster(16, 8, 1, px))
    }
    val stripes = img((x, _) => if (x < 8) 240 else 10)
    val blob = img((x, y) => if (x > 4 && x < 11 && y > 2) 180 else 30)
    val ds = Seq(
      Media(0L, "image", gradient, 16, 8, 0),
      Media(1L, "image", gradientTweak, 16, 8, 0),
      Media(2L, "image", checker, 16, 8, 0),
      Media(3L, "image", checkerTweak, 16, 8, 0),
      Media(4L, "image", stripes, 16, 8, 0),
      Media(5L, "image", blob, 16, 8, 0)).toDS()
    val dot = graft.functions.DotProduct.column _
    val v = Multimodal.embedMedia(ds, 4, 4).toDF()
      .filter(col("decoded"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
      .filter(col("norm") > 0)
    val q = broadcast(v.select(col("media_id").as("query_id"),
      col("e").as("qe"), col("norm").as("qnorm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    val g = v.select(col("media_id").as("neighbor_id"), col("e"),
        col("norm"))
      .crossJoin(q).filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("qcos",
        dot(col("e"), col("qe")) / (col("norm") * col("qnorm")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
    val nodes = (0L to 5L).toDF("id")
    val out = graft.operators.GraphDedup.knnGraphDedup(g, nodes,
      tau = 0.99).collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(0L)._1 == 0L && out(1L)._1 == 0L) // gradient pair
    assert(out(2L)._1 == 2L && out(3L)._1 == 2L) // checker pair
    assert(out(4L)._1 == 4L && out(5L)._1 == 5L) // unrelated: singletons
    assert(out(0L)._2 && !out(1L)._2 && out(2L)._2 && !out(3L)._2)
    assert(out(4L)._2 && out(5L)._2)
  }

  test("Y4mCodec: encode-decode round trip is identity across " +
    "colorspaces; header tags parse; lumaStats are exact") {
    import graft.multimodal.{VideoFrame, Y4mCodec, Y4mVideo}
    def frame(nY: Int, nC: Int, seed: Int): VideoFrame =
      VideoFrame(Array.tabulate(nY)(i => (i * 7 + seed) % 256),
        Array.tabulate(nC)(i => (i * 3 + seed) % 256),
        Array.tabulate(nC)(i => (i * 5 + seed) % 256))
    val v420 = Y4mVideo(4, 4, "420jpeg",
      Array(frame(16, 4, 1), frame(16, 4, 9)))
    val v444 = Y4mVideo(3, 2, "444", Array(frame(6, 6, 2)))
    val mono = Y4mVideo(5, 3, "mono", Array(frame(15, 0, 3)))
    for (v <- Seq(v420, v444, mono)) {
      val back = Y4mCodec.decode(Y4mCodec.encode(v))
      assert(back.isDefined, v.colorspace)
      val b = back.get
      assert(b.width == v.width && b.height == v.height &&
        b.colorspace == v.colorspace &&
        b.frames.length == v.frames.length)
      b.frames.zip(v.frames).foreach { case (g, w) =>
        assert(g.y.sameElements(w.y) && g.cb.sameElements(w.cb) &&
          g.cr.sameElements(w.cr))
      }
    }
    // absent C tag defaults to 420jpeg; frame-level tags are skipped
    val hdr = "YUV4MPEG2 W2 H2 F30:1\nFRAME Xtag\n".getBytes("US-ASCII")
    val planes = Array.tabulate(6)(i => (10 * i).toByte) // 4 Y + 1 + 1
    val withTags = Y4mCodec.decode(hdr ++ planes)
    assert(withTags.isDefined && withTags.get.colorspace == "420jpeg")
    assert(withTags.get.frames(0).y.toSeq == Seq(0, 10, 20, 30))
    assert(Y4mCodec.lumaStats(withTags.get.frames(0)) == (60L, 0, 30))
  }

  test("Y4mCodec: every malformed class returns None, never a " +
    "partial frame list") {
    import graft.multimodal.{VideoFrame, Y4mCodec, Y4mVideo}
    val good = Y4mCodec.encode(Y4mVideo(4, 4, "420jpeg",
      Array(VideoFrame(Array.fill(16)(7), Array.fill(4)(8),
        Array.fill(4)(9)))))
    assert(Y4mCodec.decode(good).isDefined)
    def s(x: String) = x.getBytes("US-ASCII")
    val cases: Seq[(String, Array[Byte])] = Seq(
      "null" -> null,
      "empty" -> Array.empty[Byte],
      "wrong magic" -> ("XUV4MPEG2".getBytes("US-ASCII") ++ good.drop(9)),
      "header never terminated" -> s("YUV4MPEG2 W4 H4"),
      "missing W" -> (s("YUV4MPEG2 H4 F25:1 C420jpeg\nFRAME\n") ++
        Array.fill[Byte](24)(1)),
      "missing H" -> (s("YUV4MPEG2 W4 F25:1 C420jpeg\nFRAME\n") ++
        Array.fill[Byte](24)(1)),
      "non-numeric W" -> s("YUV4MPEG2 Wx H4\nFRAME\n"),
      "odd dims under 420" -> (s("YUV4MPEG2 W3 H4 C420jpeg\nFRAME\n") ++
        Array.fill[Byte](18)(1)),
      "unknown colorspace" -> s("YUV4MPEG2 W4 H4 C422\nFRAME\n"),
      "unknown header tag" -> s("YUV4MPEG2 W4 H4 Q9\nFRAME\n"),
      "empty tag value" -> s("YUV4MPEG2 W4 H4 C\nFRAME\n"),
      "no frames" -> s("YUV4MPEG2 W4 H4 C420jpeg\n"),
      "bad frame marker" -> (s("YUV4MPEG2 W4 H4 C420jpeg\nFRAMX\n") ++
        Array.fill[Byte](24)(1)),
      "truncated frame payload" -> good.dropRight(1),
      "frame header never terminated" ->
        s("YUV4MPEG2 W4 H4 C420jpeg\nFRAME"),
      "second frame truncated" -> (good ++ s("FRAME\n") ++
        Array.fill[Byte](23)(1)),
      "garbage after last frame" -> (good ++ s("junk")))
    cases.foreach { case (name, bytes) =>
      assert(Y4mCodec.decode(bytes).isEmpty, name)
    }
    // encode fail-fast ladder
    intercept[IllegalArgumentException] { // odd dims under 420
      Y4mCodec.encode(Y4mVideo(3, 4, "420",
        Array(VideoFrame(Array.fill(12)(1), Array.fill(2)(1),
          Array.fill(2)(1)))))
    }
    intercept[IllegalArgumentException] { // plane size mismatch
      Y4mCodec.encode(Y4mVideo(4, 4, "420",
        Array(VideoFrame(Array.fill(15)(1), Array.fill(4)(1),
          Array.fill(4)(1)))))
    }
    intercept[IllegalArgumentException] { // sample out of byte range
      Y4mCodec.encode(Y4mVideo(2, 2, "mono",
        Array(VideoFrame(Array(0, 1, 2, 256), Array.empty,
          Array.empty))))
    }
  }

  test("videoFrameStats + embedVideoFrames: true frame boundaries " +
    "flow end to end; undecodable payloads dead-letter") {
    import graft.multimodal.{Media, Multimodal, VideoFrame, Y4mCodec,
      Y4mVideo}
    import spark.implicits._
    val twoFrames = Y4mCodec.encode(Y4mVideo(4, 4, "420jpeg", Array(
      VideoFrame(Array.tabulate(16)(i => i * 10 % 256),
        Array.fill(4)(0), Array.fill(4)(0)),
      VideoFrame(Array.fill(16)(200), Array.fill(4)(0),
        Array.fill(4)(0)))))
    val ds = Seq(
      Media(1L, "video", twoFrames, 4, 4, 0),
      Media(2L, "video", "not a video".getBytes("US-ASCII"), 0, 0, 0))
      .toDS()
    val stats = Multimodal.videoFrameStats(ds).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    assert(stats.size == 3)
    val f0 = stats((1L, 0))
    assert(f0.decoded && f0.n_pixels == 16 &&
      f0.y_sum == (0 until 16).map(i => i * 10 % 256).sum)
    assert(stats((1L, 1)).y_sum == 3200L && stats((1L, 1)).y_min == 200)
    assert(!stats((2L, 0)).decoded)
    // per-frame embeddings: constant frame centers to the zero vector,
    // the varying frame does not
    val emb = Multimodal.embedVideoFrames(ds, 2, 2).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    assert(emb((1L, 1)).e.forall(_ == 0.0))
    assert(emb((1L, 0)).e.exists(_ != 0.0))
    assert(!emb((2L, 0)).decoded && emb((2L, 0)).e.isEmpty)
  }

  test("embedVideoFrames + knnGraphDedup: a frame repeated across " +
    "videos lands in one component (temporal dedup); distinct frames " +
    "stay singletons") {
    import graft.multimodal.{Media, Multimodal, VideoFrame, Y4mCodec,
      Y4mVideo}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def fr(f: Int => Int) = VideoFrame(Array.tabulate(16)(f),
      Array.fill(4)(0), Array.fill(4)(0))
    val still = fr(i => (i * 13 + 5) % 256) // the shared still frame
    val vidA = Y4mCodec.encode(Y4mVideo(4, 4, "420jpeg",
      Array(still, fr(i => 255 - i * 9 % 256))))
    val vidB = Y4mCodec.encode(Y4mVideo(4, 4, "420jpeg",
      Array(fr(i => i * i % 256), still))) // same still, different slot
    val ds = Seq(
      Media(0L, "video", vidA, 4, 4, 0),
      Media(1L, "video", vidB, 4, 4, 0)).toDS()
    val dot = graft.functions.DotProduct.column _
    val v = Multimodal.embedVideoFrames(ds, 4, 4).toDF()
      .filter(col("decoded"))
      .select((col("media_id") * 2 + col("frame_idx")).as("fid"),
        col("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
      .filter(col("norm") > 0)
    val q = broadcast(v.select(col("fid").as("query_id"),
      col("e").as("qe"), col("norm").as("qnorm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    val g = v.select(col("fid").as("neighbor_id"), col("e"),
        col("norm"))
      .crossJoin(q).filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("qcos",
        dot(col("e"), col("qe")) / (col("norm") * col("qnorm")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
    val nodes = (0L to 3L).toDF("id")
    val out = graft.operators.GraphDedup.knnGraphDedup(g, nodes,
      tau = 0.9999).collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    // fid 0 = (vidA, frame 0), fid 3 = (vidB, frame 1): the shared
    // still groups across videos; the other two frames are singletons
    assert(out(0L)._1 == 0L && out(3L)._1 == 0L,
      s"shared still not grouped: $out")
    assert(out(1L)._1 == 1L && out(2L)._1 == 2L)
    assert(out(0L)._2 && !out(3L)._2 && out(1L)._2 && out(2L)._2)
  }

  test("embedAudio + knnGraphDedup: planted near-identical audio " +
    "(small sample perturbation, NOT byte-identical) lands in one " +
    "component; unrelated contours stay singletons") {
    import graft.multimodal.{Media, Multimodal, PcmAudio, WavCodec}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def wav(f: Int => Int): Array[Byte] =
      WavCodec.encode(PcmAudio(1, 8000, Array.tabulate(64)(f)))
    // a loud-attack contour and its near-dup: every sample jittered
    // by +-1 (the whole payload differs byte-for-byte, unlike the
    // corpus's shared-prefix near-dups — this is the genuinely
    // perturbed case the tight corpus tau never sees)
    val attack = wav(i => if (i < 16) 20000 - 100 * i else 500 + 3 * i)
    val attackJit = wav { i =>
      val base = if (i < 16) 20000 - 100 * i else 500 + 3 * i
      base + (if (i % 2 == 0) 1 else -1)
    }
    // unrelated shapes: a swell, and a mid-burst
    val swell = wav(i => 100 + 300 * i)
    val burst = wav(i => if (i >= 24 && i < 40) 25000 else 200)
    val ds = Seq(
      Media(0L, "audio", attack, 0, 0, 8000),
      Media(1L, "audio", attackJit, 0, 0, 8000),
      Media(2L, "audio", swell, 0, 0, 8000),
      Media(3L, "audio", burst, 0, 0, 8000)).toDS()
    val dot = graft.functions.DotProduct.column _
    val v = Multimodal.embedAudio(ds, 8).toDF()
      .filter(col("decoded"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
      .filter(col("norm") > 0)
    val q = broadcast(v.select(col("media_id").as("query_id"),
      col("e").as("qe"), col("norm").as("qnorm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    val g = v.select(col("media_id").as("neighbor_id"), col("e"),
        col("norm"))
      .crossJoin(q).filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("qcos",
        dot(col("e"), col("qe")) / (col("norm") * col("qnorm")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
    val nodes = (0L to 3L).toDF("id")
    val out = graft.operators.GraphDedup.knnGraphDedup(g, nodes,
      tau = 0.999).collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(0L)._1 == 0L && out(1L)._1 == 0L, // jittered pair groups
      s"planted audio pair not grouped: $out")
    assert(out(2L)._1 == 2L && out(3L)._1 == 3L) // unrelated singletons
    assert(out(0L)._2 && !out(1L)._2 && out(2L)._2 && out(3L)._2)
  }

  test("embedMedia dead-letter: undecodable payload and raster " +
    "smaller than the grid both yield decoded=false, empty e") {
    import graft.multimodal.{Media, Multimodal, PnmCodec, Raster}
    import spark.implicits._
    val tiny = PnmCodec.encode(Raster(2, 2, 1, Array(1, 2, 3, 4)))
    val ds = Seq(
      Media(1L, "image", "garbage".getBytes("US-ASCII"), 0, 0, 0),
      Media(2L, "image", tiny, 2, 2, 0)).toDS()
    val out = Multimodal.embedMedia(ds, 4, 4).collect().sortBy(_.media_id)
    assert(out.forall(e => !e.decoded && e.e.isEmpty))
  }

  test("WavCodec: encode-decode round trip is identity, including " +
    "negative samples and stereo interleaving") {
    import graft.multimodal.{PcmAudio, WavCodec}
    val mono = PcmAudio(1, 8000,
      Array(0, 1, -1, 32767, -32768, 100, -20000, 7))
    val stereo = PcmAudio(2, 44100, Array(-5, 5, 1000, -1000, 0, 255))
    for (a <- Seq(mono, stereo)) {
      val back = WavCodec.decode(WavCodec.encode(a))
      assert(back.isDefined)
      assert(back.get.channels == a.channels &&
        back.get.sampleRate == a.sampleRate)
      assert(back.get.samples.sameElements(a.samples), a)
    }
    // stats pool channels with exact integer arithmetic
    assert(WavCodec.stats(mono) == (-19894L, -32768, 32767))
    assert(WavCodec.stats(PcmAudio(1, 8000, Array.empty)) == (0L, 0, 0))
    // out-of-int16-range samples are rejected, not wrapped (r20): a
    // wrapped sample would round-trip to a DIFFERENT value
    for (bad <- Seq(32768, -32769, 65536)) {
      val e = intercept[IllegalArgumentException] {
        WavCodec.encode(PcmAudio(1, 8000, Array(0, bad)))
      }
      assert(e.getMessage.contains("int16 range"))
    }
  }

  test("WavCodec: unknown chunks are skipped; every malformed class " +
    "returns None, never a partial buffer") {
    import graft.multimodal.{PcmAudio, WavCodec}
    val good = WavCodec.encode(PcmAudio(1, 8000, Array(1, -2, 3, -4)))
    assert(WavCodec.decode(good).isDefined)
    // a LIST chunk (odd size -> padded) between fmt and data is legal
    def withJunk(src: Array[Byte]): Array[Byte] = {
      val junk = "LIST".getBytes("US-ASCII") ++
        Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9, 0) // 3 + pad
      val out = src.take(36) ++ junk ++ src.drop(36)
      // patch the RIFF size for the inserted bytes
      val total = out.length - 8
      (0 until 4).foreach(i => out(4 + i) = ((total >> (8 * i)) & 0xff).toByte)
      out
    }
    val withList = WavCodec.decode(withJunk(good))
    assert(withList.exists(_.samples.sameElements(Array(1, -2, 3, -4))))
    def patched(p: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(p) = v; b
    }
    // repair the RIFF size field so a structural fixture fails on
    // the class it targets, not on the outer size check
    def fixRiff(b: Array[Byte]): Array[Byte] = {
      val out = b.clone()
      val total = out.length - 8
      (0 until 4).foreach(i => out(4 + i) = ((total >> (8 * i)) & 0xff).toByte)
      out
    }
    val bad = Seq[Array[Byte]](
      null,
      Array[Byte](),
      patched(0, 'X'),            // not RIFF
      patched(4, 99),             // RIFF size disagrees with payload
      patched(8, 'X'),            // not WAVE
      patched(20, 3),             // non-PCM format code
      patched(34, 8),             // bits per sample != 16
      patched(22, 0),             // zero channels
      good.dropRight(1),          // truncated data payload
      fixRiff(good.take(36)),     // fmt only, no data chunk
      fixRiff(good.take(12) ++ good.drop(36))) // data before any fmt
    bad.foreach(b => assert(WavCodec.decode(b).isEmpty,
      s"decoded malformed input: ${if (b == null) "null" else b.length}"))
    // data size that is not a whole number of frames: stereo payload
    // truncated to 6 bytes = 3 samples, not 2-channel frames
    val stereo = WavCodec.encode(PcmAudio(2, 8000, Array(1, 2, 3, 4)))
    val dropped = stereo.clone()
    dropped(40) = 6 // declared data size 6
    assert(WavCodec.decode(fixRiff(dropped.dropRight(2))).isEmpty)
  }

  test("audioEnergyVec: hand-computed fixture — even and uneven " +
    "window splits, per-payload centering, negative samples square " +
    "positive") {
    import graft.multimodal.{Multimodal, PcmAudio}
    // 4 samples -> 2 windows: squares {1,9},{4,16} -> means 5,10;
    // global mean 30/4 = 7.5 -> centered [-2.5, 2.5]
    val a = PcmAudio(1, 8000, Array(1, -3, 2, -4))
    assert(Multimodal.audioEnergyVec(a, 2).toSeq == Seq(-2.5, 2.5))
    // uneven 5 -> 2: windows [0,2) and [2,5)
    val b = PcmAudio(1, 8000, Array(1, 1, 1, 1, 1))
    assert(Multimodal.audioEnergyVec(b, 2).toSeq == Seq(0.0, 0.0))
    intercept[IllegalArgumentException] {
      Multimodal.audioEnergyVec(PcmAudio(1, 8000, Array(1)), 2)
    }
  }

  test("embedAudio: real energy contours flow end to end; " +
    "undecodable and too-short payloads yield the dead-letter row") {
    import graft.multimodal.{Media, Multimodal, PcmAudio, WavCodec}
    import spark.implicits._
    val wav = WavCodec.encode(PcmAudio(1, 8000,
      Array(1, -3, 2, -4, 0, 0, 10, -10)))
    val short = WavCodec.encode(PcmAudio(1, 8000, Array(5)))
    val ds = Seq(
      Media(1L, "audio", wav, 0, 0, 8000),
      Media(2L, "audio", "junk".getBytes("US-ASCII"), 0, 0, 0),
      Media(3L, "audio", short, 0, 0, 8000)).toDS()
    val out = Multimodal.embedAudio(ds, 4).collect().sortBy(_.media_id)
    // squares {1,9},{4,16},{0,0},{100,100}; mu = 230/8 = 28.75
    assert(out(0).decoded && out(0).e.toSeq ==
      Seq(5.0 - 28.75, 10.0 - 28.75, 0.0 - 28.75, 100.0 - 28.75))
    assert(!out(1).decoded && out(1).e.isEmpty)
    assert(!out(2).decoded && out(2).e.isEmpty)
  }

  test("audioStats: real samples flow end to end; an undecodable " +
    "payload yields the dead-letter shape") {
    import graft.multimodal.{Media, Multimodal, PcmAudio, WavCodec}
    import spark.implicits._
    val wav = WavCodec.encode(PcmAudio(2, 16000, Array(10, -10, 3, 4)))
    val ds = Seq(
      Media(1L, "audio", wav, 0, 0, 16000),
      Media(2L, "audio", "not audio".getBytes("US-ASCII"), 0, 0, 0))
      .toDS()
    val st = Multimodal.audioStats(ds).collect().sortBy(_.media_id)
    assert(st(0).decoded && st(0).channels == 2 &&
      st(0).sample_rate == 16000 && st(0).n_samples == 4 &&
      st(0).s_sum == 7L && st(0).s_min == -10 && st(0).s_max == 10)
    assert(!st(1).decoded && st(1).n_samples == 0)
  }
}
