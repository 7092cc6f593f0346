package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL word n-gram instances of a token array, in document order and
  * with multiplicity — the instance-preserving sibling of
  * [[ShingleNGrams]] (which deduplicates for set-similarity mining).
  *
  * Language-model scoring (the CCNet-style perplexity filter) needs
  * every bigram OCCURRENCE, not the distinct shingle set: a document
  * that repeats an improbable bigram ten times must pay for it ten
  * times. Same native-kernel rationale as ShingleNGrams: the
  * composable transform(sequence(...)) formulation re-evaluates the
  * `words` child inside every lambda invocation after CollapseProject
  * inlines it (O(words²) per document); here `words` is evaluated once
  * and the instance list is built in a tight loop.
  */
case class NGramInstances(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_instances requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_instances"

  override protected def nullSafeEval(input: Any): Any =
    NGramInstances.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NGramInstances.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramInstances =
    copy(child = newChild)
}

object NGramInstances {
  private val SPACE = UTF8String.fromString(" ")

  /** Every n-gram instance in array order (duplicates preserved). */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        val w = words.getUTF8String(i + j)
        buf(j) = if (w == null) UTF8String.EMPTY_UTF8 else w
        j += 1
      }
      out(i) = UTF8String.concatWs(SPACE, buf: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(words: Column, n: Int): Column =
    org.apache.spark.sql.graft.Shims.column(
      NGramInstances(org.apache.spark.sql.graft.Shims.expression(words), n))
}
