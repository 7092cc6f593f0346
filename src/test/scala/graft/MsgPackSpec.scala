package graft

import graft.model.Wrp
import graft.sources.MsgPackWrp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** MessagePack WRP source: roundtrip fidelity + distributed decode +
  * malformed-input drop policy. */
class MsgPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.spark

  private def sample(i: Int): Wrp = Wrp(
    msg_type = 4,
    source = s"mac:00000000$i",
    dest = s"event:device-status/$i",
    transaction_uuid = s"txn-$i",
    content_type = if (i % 2 == 0) "application/json" else null,
    partner_ids = if (i % 3 == 0) Seq("p1", "p2") else Nil,
    metadata = if (i % 2 == 0) Map("fw" -> s"v$i", "hw" -> "rev-a") else Map.empty,
    payload = s"""{"status":"online","n":$i,"uni":"héllo→世界"}""",
    session_id = s"s-$i",
    qos = i % 100)

  test("encode/decode roundtrip preserves every WRP field") {
    (0 until 50).foreach { i =>
      val w = sample(i)
      val back = MsgPackWrp.decode(MsgPackWrp.encode(w))
      assert(back == w, s"roundtrip mismatch for sample $i")
    }
  }

  test("long strings use str8/str16/str32 encodings") {
    val long1 = sample(1).copy(payload = "x" * 200) // str8
    val long2 = sample(2).copy(payload = "y" * 40000) // str16
    val long3 = sample(3).copy(payload = "z" * 70000) // str32
    assert(MsgPackWrp.decode(MsgPackWrp.encode(long1)) == long1)
    assert(MsgPackWrp.decode(MsgPackWrp.encode(long2)) == long2)
    assert(MsgPackWrp.decode(MsgPackWrp.encode(long3)) == long3)
  }

  test("64-bit and float markers decode (interop: int64/uint64/float32/64, array32/map32)") {
    // hand-built body: fixmap{ "msg_type": int64(4), "qos": float64(7.0),
    // "source": fixstr } — standard WRP encoders emit 0xd3/0xcf for
    // values beyond int32 (epoch-ns timestamps), so these markers must
    // not be dropped as malformed
    def fixstr(s: String): Array[Byte] =
      Array((0xa0 | s.length).toByte) ++ s.getBytes("UTF-8")
    def be64(v: Long): Array[Byte] =
      (7 to 0 by -1).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    val body: Array[Byte] =
      Array(0x83.toByte) ++ // fixmap(3)
        fixstr("msg_type") ++ (Array(0xd3.toByte) ++ be64(4L)) ++
        fixstr("qos") ++ (Array(0xcb.toByte) ++ be64(java.lang.Double.doubleToLongBits(7.0))) ++
        fixstr("source") ++ fixstr("mac:1")
    val w = MsgPackWrp.decode(body)
    assert(w.msg_type == 4 && w.qos == 7 && w.source == "mac:1")

    // float32 + uint64 + array32 partner_ids + map32 metadata
    def be32(v: Int): Array[Byte] =
      (3 to 0 by -1).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    val body2: Array[Byte] =
      Array(0x84.toByte) ++
        fixstr("msg_type") ++ (Array(0xca.toByte) ++ be32(java.lang.Float.floatToIntBits(4.0f))) ++
        fixstr("qos") ++ (Array(0xcf.toByte) ++ be64(99L)) ++
        fixstr("partner_ids") ++ (Array(0xdd.toByte) ++ be32(2) ++ fixstr("p1") ++ fixstr("p2")) ++
        fixstr("metadata") ++ (Array(0xdf.toByte) ++ be32(1) ++ fixstr("k") ++ fixstr("v"))
    val w2 = MsgPackWrp.decode(body2)
    assert(w2.msg_type == 4 && w2.qos == 99)
    assert(w2.partner_ids == Seq("p1", "p2") && w2.metadata == Map("k" -> "v"))

  }

  test("decodeDataset decodes distributed and drops malformed bodies") {
    import spark.implicits._
    val good = (0 until 100).map(i => MsgPackWrp.encode(sample(i)))
    val bad = Seq(Array[Byte](0xc7.toByte, 1, 2), Array[Byte]()) // ext8 unsupported / empty
    val raw = (good ++ bad).toDF("body").repartition(5)
    val decoded = MsgPackWrp.decodeDataset(raw).collect()
    assert(decoded.length == 100)
    assert(decoded.map(_.dest).toSet == (0 until 100).map(i => s"event:device-status/$i").toSet)
  }

  test("classify counts rejects by 400 reason instead of silently dropping") {
    import spark.implicits._
    // fixmap{ "source": fixstr(1) = 0xFF } — structurally valid msgpack,
    // invalid UTF-8 inside the string (the wrp.UTF8 400 class)
    val badUtf8: Array[Byte] =
      Array(0x81.toByte) ++
        (Array((0xa0 | 6).toByte) ++ "source".getBytes("UTF-8")) ++
        Array((0xa0 | 1).toByte, 0xff.toByte)
    val bodies =
      (0 until 10).map(i => MsgPackWrp.encode(sample(i))) ++          // valid
      Seq(MsgPackWrp.encode(sample(99).copy(msg_type = 3))) ++        // bad msg_type
      Seq(Array[Byte](0xc7.toByte, 1, 2)) ++                          // undecodable (ext8)
      Seq(badUtf8) ++
      Seq(Array[Byte]())                                              // empty
    val counts = MsgPackWrp.classify(bodies.toDF("body").repartition(4))
      .map(_._2).groupByKey(identity).count().collect().toMap
    assert(counts == Map("valid" -> 10L, "invalid_msg_type" -> 1L,
      "invalid_format" -> 1L, "invalid_utf8" -> 1L, "empty_payload" -> 1L))
  }
}
