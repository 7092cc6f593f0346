package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Number of positions where two array<int> columns agree, as a native
  * codegen'd expression — the MinHash signature-agreement kernel
  * (matching minhashes / k is the unbiased Jaccard estimator).
  *
  * The composable alternative — aggregate(zip_with(a, b, eq), 0, +) —
  * is interpreted (HOFs have no doGenCode) and allocates an
  * intermediate array per evaluated pair; candidate verification
  * evaluates one pair per LSH candidate, which is the near-dup hot
  * path at scale.
  *
  * NULL semantics are DELIBERATELY stricter than that HOF: length
  * mismatch or any null element ⇒ NULL (the DotProduct convention —
  * a ragged or null-bearing signature pair is a bug upstream, not a
  * partial match), whereas zip_with null-pads the shorter side and the
  * eq-lambda counts null positions as 0. Identical results on the
  * equal-length null-free arrays signatures actually are.
  */
case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_eq_count requires (array<int>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "array_eq_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (ArrayEqCountKernel.isInvalid(x, y)) null
    else ArrayEqCountKernel.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if (graft.functions.ArrayEqCountKernel.isInvalid($a, $b)) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.ArrayEqCountKernel.compute($a, $b);
      |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayEqCount =
    copy(left = newLeft, right = newRight)
}

/** Kernel in a non-companion object: companion members whose names
  * clash with TreeNode methods get no static forwarder and silently
  * break codegen (see RegexMatchKernel). */
object ArrayEqCountKernel {
  def isInvalid(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return true
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getInt(i) == b.getInt(i)) c += 1
      i += 1
    }
    c
  }
}

object ArrayEqCount {
  def column(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      ArrayEqCount(org.apache.spark.sql.graft.Shims.expression(a),
        org.apache.spark.sql.graft.Shims.expression(b)))
}
