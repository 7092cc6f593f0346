package graft

import graft.model.Wrp
import graft.sources.MsgPackWrp
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure kernels (no Spark session). */
object MsgPackProps extends Properties("MsgPackWrp") {

  private val genStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(40)),
    Gen.const("héllo→世界 ünïcode"),
    Gen.listOfN(300, Gen.alphaChar).map(_.mkString), // forces str8/str16
    Gen.const(""))

  private val genWrp: Gen[Wrp] = for {
    mt <- Gen.chooseNum(0, 127)
    src <- genStr; dst <- genStr; txn <- genStr; ct <- genStr
    pids <- Gen.listOf(genStr).map(_.take(40)) // exceeds fixarray's 15
    meta <- Gen.mapOf(Gen.zip(Gen.alphaNumStr.map(_.take(10)), genStr))
      .map(_.take(40)) // exceeds fixmap's 15
    payload <- genStr; sid <- genStr
    qos <- Gen.chooseNum(0, 99)
  } yield Wrp(mt, src, dst, txn, ct, pids, meta, payload, sid, qos)

  property("roundtrip") = Prop.forAll(genWrp) { w =>
    MsgPackWrp.decode(MsgPackWrp.encode(w)) == w
  }

  property("garbage never crashes decodeDataset's guard") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { bs =>
      try { MsgPackWrp.decode(bs.toArray); true }
      catch { case _: Exception => true } // must throw cleanly, not hang/corrupt
    }
}

object ExactProps extends Properties("Exact") {
  /** Decimal-exact sums must equal the BigDecimal ground truth for any
    * 2-decimal inputs — the invariant the whole oracle-parity strategy
    * rests on. (The partitioning-independence half is exercised by the
    * Spark-side specs; this pins the arithmetic.) */
  property("decimal sum equals BigDecimal ground truth") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(-99999L, 99999L))) { cents =>
      val doubles = cents.map(_ / 100.0)
      val viaDecimal = doubles
        .map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum
      val groundTruth = BigDecimal(cents.sum) / 100
      viaDecimal == groundTruth
    }
}

object TopKProps extends Properties("TopKLongs") {
  import scala.collection.mutable.ArrayBuffer

  private val genPairs: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(-100L, 100L), Gen.chooseNum(0L, 50L)))

  /** merge-of-partials == top-k of the whole, for any split point. */
  property("partial merge equals global topk") =
    Prop.forAll(genPairs, Gen.chooseNum(1, 10)) { (pairs, k) =>
      val agg = graft.functions.TopKLongs(null, null, k)
      def bufOf(xs: List[(Long, Long)]) = {
        val b = ArrayBuffer.empty[(Long, Long)]
        // route through serialize/deserialize to exercise the wire path
        xs.foreach(b += _)
        agg.deserialize(agg.serialize(b))
      }
      Prop.forAll(Gen.chooseNum(0, pairs.length)) { split =>
        val (l, r) = pairs.splitAt(split)
        val merged = agg.merge(bufOf(l), bufOf(r))
        val got = merged.sortBy { case (s, p) => (-s, p) }.take(k).toList
        got == pairs.sortBy { case (s, p) => (-s, p) }.take(k)
      }
    }
}

object Sq8Props extends Properties("Sq8") {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private val genVec: Gen[Array[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)).map(_.toArray)

  private def arr(x: Array[Double]): ArrayData = new GenericArrayData(x)

  /** decode(codes(x), mn, scale) must equal roundtrip(x) bit-for-bit —
    * the identity Similarity.sq8Index/sq8Search rests on, here over
    * adversarial random vectors instead of the corpus. */
  property("decode of codes equals roundtrip") =
    Prop.forAll(genVec) { x =>
      val mn = x.min
      val scale = (x.max - x.min) / 255.0
      val rt = graft.functions.Sq8.roundtrip(arr(x)).toDoubleArray().toSeq
      val dc = graft.functions.Sq8.decode(
        graft.functions.Sq8.codes(arr(x)), mn, scale).toDoubleArray().toSeq
      rt == dc
    }

  /** Per-element reconstruction error is bounded by ~one grid step and
    * every grid value stays inside [mn, mx] up to 1-ulp rounding. */
  property("error bounded by the grid step; grid values inside [mn, mx]") =
    Prop.forAll(genVec) { x =>
      val mn = x.min; val mx = x.max
      val step = (mx - mn) / 255.0
      val rt = graft.functions.Sq8.roundtrip(arr(x)).toDoubleArray()
      val eps = math.max(step, math.ulp(math.max(math.abs(mn), math.abs(mx))))
      x.indices.forall { i =>
        math.abs(x(i) - rt(i)) <= eps * 1.0000001 &&
          rt(i) >= mn - eps * 1e-6 && rt(i) <= mx + eps * 1e-6
      }
    }

  // NOTE deliberately NOT a property: roundtrip is NOT idempotent. A
  // second roundtrip re-derives the grid from the decoded values — its
  // mx is the top OCCUPIED grid point (and fp rounding of mn + k·scale
  // shifts cell boundaries), so values can move by up to one step
  // (falsified empirically at seed ~10). This is inherent to per-vector
  // re-derived grids; a code-resident index therefore keeps (mn, scale)
  // FIXED and never re-encodes decoded vectors — the contract
  // Similarity.sq8Index implements by storing the grid params alongside
  // the codes. The guaranteed identity is decode∘codes ≡ roundtrip
  // (property above); re-encoded drift stays within one step by the
  // error-bound property applied to the decoded vector as input.

  property("non-finite and empty inputs are invalid") =
    Prop.forAll(genVec) { x =>
      val withNaN = x :+ Double.NaN
      graft.functions.Sq8.isInvalid(arr(withNaN)) &&
        graft.functions.Sq8.isInvalid(arr(Array.empty[Double])) &&
        !graft.functions.Sq8.isInvalid(arr(x))
    }
}
