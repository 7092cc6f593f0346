package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sequential double dot product of two array<double> columns as a native
  * codegen'd Catalyst expression.
  *
  * The composable alternative — aggregate(zip_with(a, b, *), 0d, +) —
  * is interpreted (higher-order functions have no doGenCode) and
  * allocates an intermediate array per row; on an all-pairs similarity
  * join that is millions of allocations. This expression is a tight
  * primitive loop inside whole-stage codegen. Summation order is
  * left-to-right, identical to the HOF version and to DuckDB's
  * list_dot_product, so results stay bit-exact across engines.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  // NULL on length mismatch or null elements — the exact semantics of
  // aggregate(zip_with(a,b,*),0d,+) (zip_with null-pads the shorter
  // side; null propagates through the sum), so the optimizer rewrite is
  // truly semantics-preserving.
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (DotProduct.isInvalid(x, y)) null else DotProduct.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if (graft.functions.DotProduct.isInvalid($a, $b)) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.DotProduct.compute($a, $b);
      |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Length mismatch or any null element ⇒ the HOF formulation yields
    * NULL; mirror it exactly. */
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

  /** Shared by interpreted eval and generated code. Sequential
    * left-to-right sum — bit-compatible with DuckDB list_dot_product. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  def column(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      DotProduct(org.apache.spark.sql.graft.Shims.expression(a),
        org.apache.spark.sql.graft.Shims.expression(b)))
}
