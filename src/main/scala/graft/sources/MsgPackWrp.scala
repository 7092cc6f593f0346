package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import graft.model.Wrp
import org.apache.spark.sql.{DataFrame, Dataset}

/** Minimal MessagePack codec for WRP messages (the reference accepts
  * `application/msgpack` bodies alongside JSON —
  * internal/event/request_handler.go decode path; format per the public
  * MessagePack spec). Pure Scala: the container has no msgpack library,
  * and the WRP subset only needs maps, strings, ints, bins, arrays,
  * nil and bool.
  *
  * Decoding runs per-partition over a binary column — one Dataset pass,
  * no driver involvement, so the source scales like any other columnar
  * scan. Unknown/extra map keys are skipped (WRP is open-ended).
  */
object MsgPackWrp {

  // ---- decoder -----------------------------------------------------

  /** Invalid UTF-8 inside a str field — the reference distinguishes
    * this 400 (wrp.UTF8, request_handler.go:121-129) from a plain
    * decode failure, so it gets its own exception type. */
  final class InvalidUtf8Exception(msg: String)
      extends IllegalArgumentException(msg)

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16().toLong
    def bytes(n: Int): Array[Byte] = {
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; r
    }
    def u64(): Long = (u32() << 32) | u32()
    // STRICT decode: new String(_, UTF_8) silently replaces invalid
    // sequences with U+FFFD, which would let bytes the reference 400s
    // (wrp.UTF8) sail through as "valid" — decode with REPORT instead.
    // One decoder per Reader (single-threaded), reset per field.
    private val utf8Dec = UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    def str(n: Int): String = {
      val raw = bytes(n)
      utf8Dec.reset()
      try utf8Dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
      catch {
        case e: java.nio.charset.CharacterCodingException =>
          throw new InvalidUtf8Exception(
            s"invalid UTF-8 in msgpack str at ${pos - n}: ${e.getMessage}")
      }
    }
  }

  /** Parse one msgpack value. Maps come back as Map[String, Any] (WRP
    * map keys are always strings), arrays as Seq[Any], bin as
    * Array[Byte]. */
  private def parse(r: Reader): Any = {
    val t = r.u8()
    t match {
      case x if x <= 0x7f => x.toLong // positive fixint
      case x if x >= 0xe0 => (x - 256).toLong // negative fixint
      case x if (x & 0xf0) == 0x80 => // fixmap
        parseMap(r, x & 0x0f)
      case x if (x & 0xf0) == 0x90 => // fixarray
        Seq.fill(x & 0x0f)(parse(r))
      case x if (x & 0xe0) == 0xa0 => // fixstr
        r.str(x & 0x1f)
      case 0xc0 => null
      case 0xc2 => false
      case 0xc3 => true
      case 0xc4 => r.bytes(r.u8()) // bin8
      case 0xc5 => r.bytes(r.u16()) // bin16
      case 0xca => // float32
        java.lang.Float.intBitsToFloat(r.u32().toInt).toDouble
      case 0xcb => java.lang.Double.longBitsToDouble(r.u64()) // float64
      case 0xcc => r.u8().toLong // uint8
      case 0xcd => r.u16().toLong // uint16
      case 0xce => r.u32() // uint32
      case 0xcf => r.u64() // uint64 (two's-complement beyond Long.MaxValue)
      case 0xd0 => r.u8().toByte.toLong // int8
      case 0xd1 => r.u16().toShort.toLong // int16
      case 0xd2 => r.u32().toInt.toLong // int32
      case 0xd3 => r.u64() // int64 (standard for epoch-ns timestamps)
      case 0xd9 => r.str(r.u8()) // str8
      case 0xda => r.str(r.u16()) // str16
      case 0xdb => r.str(r.u32().toInt) // str32
      case 0xdc => Seq.fill(r.u16())(parse(r)) // array16
      case 0xdd => Seq.fill(r.u32().toInt)(parse(r)) // array32
      case 0xde => parseMap(r, r.u16()) // map16
      case 0xdf => parseMap(r, r.u32().toInt) // map32
      case other =>
        throw new IllegalArgumentException(
          f"unsupported msgpack type 0x$other%02x at ${r.pos - 1}")
    }
  }

  private def parseMap(r: Reader, n: Int): Map[String, Any] = {
    val m = mutable.LinkedHashMap.empty[String, Any]
    var i = 0
    while (i < n) {
      val k = parse(r) match {
        case s: String => s
        case other => throw new IllegalArgumentException(
          s"msgpack map key must be a string, got $other")
      }
      m(k) = parse(r)
      i += 1
    }
    m.toMap
  }

  /** Decode one WRP message; throws on malformed input (callers choose
    * the drop/dead-letter policy, mirroring the reference's 400 path). */
  def decode(bytes: Array[Byte]): Wrp = {
    val m = parse(new Reader(bytes)) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(
        s"WRP msgpack body must be a map, got $other")
    }
    def str(k: String): String = m.get(k) match {
      case Some(s: String) => s
      case Some(b: Array[Byte]) => new String(b, UTF_8)
      case _ => null
    }
    def int(k: String, dflt: Int): Int = m.get(k) match {
      case Some(l: Long) => l.toInt
      case Some(d: Double) => d.toInt // encoders that emit float32/64 ints
      case _ => dflt
    }
    Wrp(
      msg_type = int("msg_type", -1),
      source = str("source"),
      dest = str("dest"),
      transaction_uuid = str("transaction_uuid"),
      content_type = str("content_type"),
      partner_ids = m.get("partner_ids") match {
        case Some(xs: Seq[Any @unchecked]) => xs.collect { case s: String => s }
        case _ => Nil
      },
      metadata = m.get("metadata") match {
        case Some(mm: Map[String @unchecked, Any @unchecked]) =>
          mm.collect { case (k, v: String) => (k, v) }
        case _ => Map.empty
      },
      payload = str("payload"),
      session_id = str("session_id"),
      qos = int("qos", 0))
  }

  // ---- encoder (tests + sink emulation) ----------------------------

  private final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit = { u16((v >> 16).toInt); u16(v.toInt) }
    def u64(v: Long): Unit = { u32(v >>> 32); u32(v) }
  }

  private def writeStr(w: Writer, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    if (b.length < 32) w.u8(0xa0 | b.length)
    else if (b.length < 256) { w.u8(0xd9); w.u8(b.length) }
    else if (b.length < 65536) { w.u8(0xda); w.u16(b.length) }
    else { w.u8(0xdb); w.u32(b.length.toLong) } // str32
    w.out.write(b)
  }

  private def writeInt(w: Writer, v: Long): Unit =
    if (v >= 0 && v <= 0x7f) w.u8(v.toInt)
    else if (v < 0 && v >= -32) w.u8((v & 0xff).toInt)
    else if (v >= 0 && v <= 0xffff) { w.u8(0xcd); w.u16(v.toInt) }
    else if (v >= Int.MinValue && v <= Int.MaxValue) { w.u8(0xd2); w.u32(v & 0xffffffffL) }
    else { w.u8(0xd3); w.u64(v) } // int64 — epoch-ns scale values

  /** Encode a WRP message (null string fields are omitted, like the
    * reference's omitempty JSON tags). */
  def encode(wrp: Wrp): Array[Byte] = {
    val w = new Writer
    val fields = mutable.LinkedHashMap.empty[String, () => Unit]
    fields("msg_type") = () => writeInt(w, wrp.msg_type)
    def strField(k: String, v: String): Unit =
      if (v != null) fields(k) = () => writeStr(w, v)
    strField("source", wrp.source)
    strField("dest", wrp.dest)
    strField("transaction_uuid", wrp.transaction_uuid)
    strField("content_type", wrp.content_type)
    if (wrp.partner_ids.nonEmpty) fields("partner_ids") = () => {
      // fixarray caps at 15 elements; beyond that 0x90|len corrupts the
      // marker byte (0x90|16 = 0xa0 = fixstr) — use array16
      if (wrp.partner_ids.length < 16) w.u8(0x90 | wrp.partner_ids.length)
      else { w.u8(0xdc); w.u16(wrp.partner_ids.length) }
      wrp.partner_ids.foreach(writeStr(w, _))
    }
    if (wrp.metadata.nonEmpty) fields("metadata") = () => {
      if (wrp.metadata.size < 16) w.u8(0x80 | wrp.metadata.size)
      else { w.u8(0xde); w.u16(wrp.metadata.size) }
      wrp.metadata.foreach { case (k, v) => writeStr(w, k); writeStr(w, v) }
    }
    strField("payload", wrp.payload)
    strField("session_id", wrp.session_id)
    fields("qos") = () => writeInt(w, wrp.qos)
    if (fields.size < 16) w.u8(0x80 | fields.size)
    else { w.u8(0xde); w.u16(fields.size) }
    fields.foreach { case (k, write) => writeStr(w, k); write() }
    w.out.toByteArray
  }

  // ---- Dataset source ----------------------------------------------

  /** Decode a binary-column DataFrame of msgpack WRP bodies into a typed
    * Dataset[Wrp]; malformed rows are dropped (the reference answers 400
    * and drops them — request_handler.go decode error path). For
    * counted drops use [[classify]] — silent flatMap-dropping loses the
    * dead-letter signal a production ingest needs. */
  def decodeDataset(raw: DataFrame, bytesCol: String = "body"): Dataset[Wrp] = {
    import raw.sparkSession.implicits._
    raw.select(bytesCol).as[Array[Byte]].mapPartitions { it =>
      it.flatMap { bytes =>
        try Some(decode(bytes)) catch { case _: Exception => None }
      }
    }
  }

  /** Every body tagged with the reference's 400-reason ladder
    * (request_handler.go:95-131; mirrors JsonWrp.classify): decoded
    * message (null on failure) + reject_reason, so rejects are COUNTED
    * per reason instead of silently dropped. One decode per row,
    * per-partition, no driver involvement. */
  def classify(raw: DataFrame, bytesCol: String = "body"): Dataset[(Wrp, String)] = {
    import raw.sparkSession.implicits._
    raw.select(bytesCol).as[Array[Byte]].mapPartitions { it =>
      it.map { bytes =>
        if (bytes == null || bytes.isEmpty) (null: Wrp, "empty_payload")
        else try {
          val w = decode(bytes)
          if (w.msg_type != 4) (w, "invalid_msg_type") else (w, "valid")
        } catch {
          case _: InvalidUtf8Exception => (null: Wrp, "invalid_utf8")
          case _: Exception => (null: Wrp, "invalid_format")
        }
      }
    }
  }
}
