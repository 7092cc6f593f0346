package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-n-gram repetition statistics for Gopher-style quality
  * filtering (Rae et al. 2021 §A1.1: documents dominated by repeated
  * lines / n-grams are boilerplate): given a token array, returns
  * `struct(n_grams, n_distinct, top_count)` — the total n-gram count,
  * the distinct n-gram count, and the occurrence count of the most
  * frequent n-gram.
  *
  * Why a native expression: the composable HOF spelling
  * (`array_max(transform(array_distinct(ws), w -> size(filter(ws, x ->
  * x = w))))`) is O(distinct × words) per document AND re-evaluates the
  * inlined `split` inside every lambda call (same CollapseProject trap
  * as [[ShingleNGrams]]). Here the child is evaluated once and the
  * counts come from a single hash-map pass — O(words) per document,
  * fully map-side, zero shuffle at any corpus size.
  */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  private val SPACE = UTF8String.fromString(" ")

  def compute(words: ArrayData, n: Int): InternalRow = {
    val m = words.numElements()
    if (m < n) return new GenericInternalRow(Array[Any](0, 0, 0))
    val counts = new java.util.HashMap[UTF8String, Integer]((m - n + 1) * 2)
    val buf = new Array[UTF8String](n)
    var top = 0
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        val w = words.getUTF8String(i + j)
        buf(j) = if (w == null) UTF8String.EMPTY_UTF8 else w
        j += 1
      }
      val g = if (n == 1) buf(0) else UTF8String.concatWs(SPACE, buf: _*)
      val prev = counts.get(g)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(g, c)
      if (c > top) top = c
      i += 1
    }
    new GenericInternalRow(Array[Any](m - n + 1, counts.size(), top))
  }

  def column(words: Column, n: Int): Column =
    org.apache.spark.sql.graft.Shims.column(
      RepetitionStats(org.apache.spark.sql.graft.Shims.expression(words), n))
}
