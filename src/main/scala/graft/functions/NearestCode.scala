package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Argmin-by-squared-distance over a centroid array as ONE native
  * kernel: `nearest_code(cs, e, see)` scans the
  * array<struct<cluster:int, ce:array<double>, scc:double>> in array
  * order and returns struct<cluster:int, d2:double> for the centroid
  * minimizing d2 = see − 2·dot(e, ce) + scc, ties broken toward the
  * lower cluster id.
  *
  * This is the assignment step of Lloyd's k-means and PQ codebook
  * training (Similarity.kmeans / Similarity.pqFit). The composable
  * formulation — an aggregate() fold whose lambda computes the dot and
  * a conditional struct swap — is interpreted per ELEMENT (higher-order
  * functions have no doGenCode) and allocates an accumulator struct per
  * step; at 480k work rows × 256 codes × 3 iterations that is ~370M
  * interpreted lambda frames and the probe-measured pqFit wall was
  * 448 s at 60k vectors. This kernel is one virtual call per ROW with a
  * tight primitive loop inside (the DotProduct precedent), and is
  * registered for generated code via a static helper.
  *
  * Bit-exactness: the inner dot is the same sequential left-to-right
  * double sum as DotProduct/list_dot_product; d2 is evaluated as
  * (see − 2.0·dot) + scc exactly like the fold's expression tree; the
  * comparison d2 < best ∨ (d2 = best ∧ cluster < bestCluster) matches
  * the fold's when() on every reachable input (d2 is never NaN-selected
  * under either semantics, and ±0.0 compare equal in both), so swapping
  * the fold for this kernel changes no assignment — KmeansScoringSpec's
  * prod == seqfold-twin pin and PqSpec's exact-endpoint pin hold
  * unchanged. Null handling mirrors the fold where reachable: a null
  * centroid entry or length-mismatched ce contributes nothing (the
  * fold's when(null) → otherwise(acc)); null top-level inputs yield
  * NULL. When NO centroid was scored at all (empty array, or every
  * entry null/length-mismatched) the result is NULL too — a caller can
  * distinguish "no assignment possible" from a real assignment, instead
  * of receiving a (Int.MaxValue, Double.MaxValue) sentinel dressed as
  * one (ADVICE r15). Both in-repo callers (kmeans/pqFit seeding) build
  * centroid sets that are non-empty whenever the corpus is, so the NULL
  * is unreachable there by construction. */
case class NearestCode(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StructType(Array(
            StructField(_, IntegerType, _, _),
            StructField(_, ArrayType(DoubleType, _), _, _),
            StructField(_, DoubleType, _, _))), _),
          ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "nearest_code requires (array<struct<int, array<double>, " +
          s"double>>, array<double>, double), got (${a.catalogString}, " +
          s"${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_code"

  override protected def nullSafeEval(cs: Any, e: Any, see: Any): Any =
    NearestCode.compute(cs.asInstanceOf[ArrayData],
      e.asInstanceOf[ArrayData], see.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    // compute() returns null when no centroid was scored — propagate it
    // as SQL NULL instead of dereferencing a null InternalRow downstream
    nullSafeCodeGen(ctx, ev, (cs, e, see) =>
      s"""${ev.value} = graft.functions.NearestCode.compute($cs, $e, $see);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): NearestCode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestCode {
  /** Shared by interpreted eval and generated code. Returns null when
    * no centroid was scored (empty / all-invalid array). */
  def compute(cs: ArrayData, e: ArrayData, see: Double): InternalRow = {
    val x = e.toDoubleArray()
    val dim = x.length
    var bestCluster = Int.MaxValue
    var bestD2 = Double.MaxValue
    var scored = false
    val n = cs.numElements()
    var i = 0
    while (i < n) {
      if (!cs.isNullAt(i)) {
        val c = cs.getStruct(i, 3)
        if (!c.isNullAt(0) && !c.isNullAt(1) && !c.isNullAt(2)) {
          val ce = c.getArray(1)
          if (!DotProduct.isInvalid(e, ce)) {
            val y = ce.toDoubleArray()
            var dot = 0.0
            var j = 0
            while (j < dim) { dot += x(j) * y(j); j += 1 }
            val d2 = see - 2.0 * dot + c.getDouble(2)
            val cluster = c.getInt(0)
            // identical comparison to the fold it replaced: NaN/+Inf
            // distances are never selected (NaN compares false; +Inf
            // is not < MaxValue), so `scored` tracks SELECTION — a row
            // whose every comparable distance is NaN/Inf reads as "no
            // assignment" (null) rather than a sentinel
            if (d2 < bestD2 || (d2 == bestD2 && cluster < bestCluster)) {
              bestCluster = cluster
              bestD2 = d2
              scored = true
            }
          }
        }
      }
      i += 1
    }
    if (scored) InternalRow(bestCluster, bestD2) else null
  }

  def column(cs: Column, e: Column, see: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      NearestCode(org.apache.spark.sql.graft.Shims.expression(cs),
        org.apache.spark.sql.graft.Shims.expression(e),
        org.apache.spark.sql.graft.Shims.expression(see)))
}
