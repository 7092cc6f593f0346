package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructType}

/** The per-query dense ADC lookup-table build — tarr[i] =
  * dot(qe[cb[i].s·sub ‥ +sub), cb[i].ce) over the slot-ordered
  * codebook array — as a native codegen'd Catalyst expression.
  *
  * [[graft.operators.Similarity]]'s bulk kNN join builds one of these
  * per QUERY (m·kc slots, each an O(sub) dot): at 20k queries ×
  * 2048 slots that is 41M higher-order-function frames under the
  * composable transform(cb, e ⇒ dot(slice(qe, …), e.ce)) formulation
  * — interpreted, boxed, and allocating a slice per slot. This kernel
  * is one tight nested loop per query emitting the whole table.
  *
  * Bit-identity with the HOF it replaces: per slot the dot is the
  * same sequential left-to-right double sum over the same qe window
  * ([[DotProduct]]'s order), slots evaluated in array order — oracle
  * hashes re-gated unchanged on swap-in. Element-level NULL semantics
  * mirror the HOF exactly: a slot whose codebook row is null, whose
  * ce length ≠ sub, whose qe window runs past qe's end (slice
  * shortens, DotProduct then nulls on the length mismatch), or with
  * any null element, yields a NULL table entry — never reached from
  * [[graft.operators.Similarity]]'s internally-built codebook arrays,
  * and [[AdcFold]] downstream nulls any score reading such a slot.
  */
case class AdcTable(left: Expression, right: Expression, sub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(s: StructType, _))
          if s.length == 2 && s(0).dataType == IntegerType &&
            s(1).dataType.isInstanceOf[ArrayType] &&
            s(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_table requires (array<double> qe, " +
          s"array<struct<s:int, ce:array<double>>> cb), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "adc_table"

  override protected def nullSafeEval(q: Any, c: Any): Any =
    AdcTable.compute(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => s"""
      |${ev.value} = graft.functions.AdcTable.compute($q, $c, $sub);""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcTable =
    copy(left = newLeft, right = newRight)
}

object AdcTable {
  /** Shared by interpreted eval and generated code. One nested loop:
    * per codebook entry, the sequential dot of the entry's qe window
    * with its ce — [[DotProduct]]'s exact order per slot, slots in
    * array order. Invalid slots (null row / wrong-length ce / window
    * past qe / null elements) emit a NULL entry, mirroring the
    * transform+slice+dot HOF. */
  def compute(qe: ArrayData, cb: ArrayData, sub: Int): ArrayData = {
    val n = cb.numElements()
    val qlen = qe.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = null
      if (!cb.isNullAt(i)) {
        val row = cb.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val s = row.getInt(0)
          val ce = row.getArray(1)
          val start = s * sub
          if (ce.numElements() == sub && start >= 0 && start + sub <= qlen) {
            var ok = true
            var sum = 0.0
            var j = 0
            while (ok && j < sub) {
              if (qe.isNullAt(start + j) || ce.isNullAt(j)) ok = false
              else sum += qe.getDouble(start + j) * ce.getDouble(j)
              j += 1
            }
            if (ok) out(i) = sum
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(qe: Column, cb: Column, sub: Int): Column =
    org.apache.spark.sql.graft.Shims.column(
      AdcTable(org.apache.spark.sql.graft.Shims.expression(qe),
        org.apache.spark.sql.graft.Shims.expression(cb), sub))
}
