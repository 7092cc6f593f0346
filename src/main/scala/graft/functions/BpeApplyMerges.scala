package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply an ordered BPE merge list to a symbol sequence as ONE native
  * kernel: `bpe_apply(syms, merges)` takes the current segmentation
  * (array<string>) and the learned merge rules
  * (array<struct<lhs:string, rhs:string>>, already in rank order) and
  * applies each rule in turn with the standard greedy left-to-right
  * fold: scanning the sequence, an adjacent (lhs, rhs) pair collapses
  * into the concatenated symbol, and the freshly merged symbol is
  * itself eligible as the LEFT side of the next comparison within the
  * same rule pass (the classic sequential-fold semantics — e.g. rule
  * (a,a) over [a,a,a,a] yields [aa,aa], over [a,a,a] yields [aa,a]).
  *
  * This is the encode step of the in-engine BPE tokenizer
  * (graft.operators.BpeTokenizer): training applies ONE rule per
  * round to the vocabulary table; encoding applies the whole frozen
  * table map-side. The composable aggregate()-fold spelling is
  * interpreted per symbol per rule (HOFs have no doGenCode) and
  * allocates an accumulator array per step — this kernel is one
  * virtual call per row with tight loops inside (the
  * NGramInstances/RepetitionStats precedent).
  *
  * Cross-engine exactness: pure string equality and concatenation —
  * no floats anywhere. The DuckDB oracle replays the identical fold
  * with list_reduce over the same rule order (BpeSpec pins the kernel
  * against a plain-Scala fold reference on randomized inputs).
  * Rules with an empty or null side never match (symbols are
  * non-empty by construction); null symbol entries pass through
  * untouched. */
case class BpeApplyMerges(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StructType(Array(
            StructField(_, StringType, _, _),
            StructField(_, StringType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        "bpe_apply requires (array<string>, array<struct<string, " +
          s"string>>), got (${a.catalogString}, ${b.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "bpe_apply"

  override protected def nullSafeEval(syms: Any, merges: Any): Any =
    BpeApplyMerges.compute(syms.asInstanceOf[ArrayData],
      merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (syms, merges) =>
      s"graft.functions.BpeApplyMerges.compute($syms, $merges)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeApplyMerges =
    copy(left = newLeft, right = newRight)
}

object BpeApplyMerges {
  /** Shared by interpreted eval and generated code. */
  def compute(syms: ArrayData, merges: ArrayData): ArrayData = {
    var cur: Array[UTF8String] = {
      val n = syms.numElements()
      val a = new Array[UTF8String](n)
      var i = 0
      while (i < n) {
        a(i) = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
        i += 1
      }
      a
    }
    val nm = merges.numElements()
    var m = 0
    while (m < nm) {
      if (!merges.isNullAt(m)) {
        val rule = merges.getStruct(m, 2)
        if (!rule.isNullAt(0) && !rule.isNullAt(1)) {
          val lhs = rule.getUTF8String(0)
          val rhs = rule.getUTF8String(1)
          if (lhs.numBytes() > 0 && rhs.numBytes() > 0) {
            // greedy left-to-right fold: the merged symbol stays the
            // comparison target for the NEXT element of this pass
            val out = new Array[UTF8String](cur.length)
            var n = 0
            var i = 0
            while (i < cur.length) {
              val x = cur(i)
              if (n > 0 && out(n - 1) != null && x != null &&
                  out(n - 1).equals(lhs) && x.equals(rhs)) {
                out(n - 1) = UTF8String.concat(lhs, rhs)
              } else {
                out(n) = x
                n += 1
              }
              i += 1
            }
            cur = java.util.Arrays.copyOf(out, n)
          }
        }
      }
      m += 1
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }

  def column(syms: Column, merges: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      BpeApplyMerges(org.apache.spark.sql.graft.Shims.expression(syms),
        org.apache.spark.sql.graft.Shims.expression(merges)))
}
