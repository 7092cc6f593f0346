package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.scalacheck.{Gen, Prop, Properties}

/** Randomized differential test for the [[graft.functions.NearestCode]]
  * kernel: on arbitrary centroid arrays (duplicate centroids,
  * exact-tie distances, empty arrays, mismatched dimensions) the
  * tight-loop compute must agree BIT-FOR-BIT with an obvious
  * sequential plain-Scala reference implementing the aggregate()-fold
  * semantics it replaced (scan in array order, replace on d2 < best
  * or d2 = best with a lower cluster id, skip length-mismatched
  * entries). Same differential pattern as Sq8Props/TextScoring. */
object NearestCodeProps extends Properties("NearestCode") {

  private def reference(cs: Seq[(Int, Array[Double], Double)],
      e: Array[Double], see: Double): Option[(Int, Double)] = {
    var best = (Int.MaxValue, Double.MaxValue)
    var selected = false
    cs.foreach { case (cluster, ce, scc) =>
      if (ce.length == e.length) {
        var dot = 0.0
        var j = 0
        while (j < e.length) { dot += e(j) * ce(j); j += 1 }
        val d2 = see - 2.0 * dot + scc
        if (d2 < best._2 || (d2 == best._2 && cluster < best._1)) {
          best = (cluster, d2)
          selected = true
        }
      }
    }
    if (selected) Some(best) else None
  }

  private def row(c: (Int, Array[Double], Double)): InternalRow =
    InternalRow(c._1, new GenericArrayData(c._2), c._3)

  private def vecGen(dim: Int): Gen[List[Double]] = Gen.listOfN(dim,
    Gen.chooseNum(-4.0, 4.0).map(x => math.rint(x * 4) / 4))

  private val caseGen: Gen[(Array[Double], List[(Int, Array[Double], Double)])] =
    Gen.choose(1, 6).flatMap { dim =>
      for {
        e <- vecGen(dim)
        n <- Gen.choose(0, 12)
        cs <- Gen.listOfN(n, for {
          cluster <- Gen.choose(0, 5) // few ids => real ties
          // sometimes a WRONG dimension => must be skipped
          cdim <- Gen.frequency((9, Gen.const(dim)), (1, Gen.choose(1, 6)))
          ce <- vecGen(cdim)
          scc <- Gen.frequency(
            (1, Gen.const(ce.map(x => x * x).sum)),
            (1, Gen.chooseNum(-2.0, 20.0)))
        } yield (cluster, ce.toArray, scc))
      } yield (e.toArray, cs)
    }

  property("compute == sequential fold reference (random centroid sets)") =
    Prop.forAll(caseGen) { case (e, cs) =>
      val see = e.map(x => x * x).sum
      val got = graft.functions.NearestCode.compute(
        new GenericArrayData(cs.map(row).toArray),
        new GenericArrayData(e), see)
      reference(cs, e, see) match {
        case None => got == null
        case Some(want) =>
          got != null && got.getInt(0) == want._1 &&
            java.lang.Double.doubleToRawLongBits(got.getDouble(1)) ==
              java.lang.Double.doubleToRawLongBits(want._2)
      }
    }

  property("duplicate centroids: the LOWER cluster id wins the exact tie") =
    Prop {
      val ce = Array(1.0, 2.0)
      val cs = new GenericArrayData(Array[Any](
        row((7, ce, 5.0)), row((3, ce, 5.0)), row((9, ce, 5.0))))
      val out = graft.functions.NearestCode.compute(
        cs, new GenericArrayData(Array(1.0, 2.0)), 5.0)
      out.getInt(0) == 3 && out.getDouble(1) == 0.0
    }

  property("empty centroid array yields NULL, not a sentinel") =
    Prop {
      graft.functions.NearestCode.compute(
        new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array(1.0)), 1.0) == null
    }

  property("all-invalid centroid array (dim mismatch) yields NULL") =
    Prop {
      graft.functions.NearestCode.compute(
        new GenericArrayData(Array[Any](row((1, Array(1.0, 2.0), 5.0)))),
        new GenericArrayData(Array(1.0)), 1.0) == null
    }
}
