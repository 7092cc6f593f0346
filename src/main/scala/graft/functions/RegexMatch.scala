package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** rlike with a NON-LITERAL pattern and a compiled-pattern cache.
  *
  * Spark's RLike caches the compiled regex only when the pattern is
  * foldable; with a pattern column (the route-table join predicate —
  * reference filter/filter.go:63 matches each message against every
  * configured filter's regex) it recompiles per evaluated row-pair. The
  * route fanout evaluates events × routes predicates, so at 100 TB that
  * is billions of Pattern.compile calls for a handful of distinct
  * patterns. This expression memoizes compiled patterns per JVM —
  * route tables are small config, so the cache stays tiny.
  *
  * Semantics are identical to rlike: Java regex, partial match (find).
  */
case class RegexMatch(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"regex_match requires (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def prettyName: String = "regex_match"

  override protected def nullSafeEval(s: Any, p: Any): Any =
    RegexMatchKernel.find(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  // NOTE: the kernel lives in a separate (non-companion) object: a
  // companion method named `find` clashes with TreeNode.find, so Scala
  // emits no static forwarder and generated Java would resolve to the
  // instance method.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, p) => s"graft.functions.RegexMatchKernel.find($s, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RegexMatch =
    copy(left = newLeft, right = newRight)
}

object RegexMatchKernel {
  // route tables are bounded config; the guard only protects against a
  // pathological unbounded-pattern workload
  private val MaxCacheSize = 10000
  private val cache = new ConcurrentHashMap[String, Pattern]()

  def find(s: UTF8String, p: UTF8String): Boolean = {
    val key = p.toString
    var pat = cache.get(key)
    if (pat == null) {
      pat = Pattern.compile(key)
      // At the cap, evict ONE arbitrary entry before admitting the new
      // pattern. Clearing the whole map would let an adversarial
      // high-cardinality pattern column make every thread clear +
      // recompile in a loop; refusing admission forever would pin a
      // stale working set after a route-table swap and recompile the
      // NEW hot patterns on every row. One-out-one-in keeps the map
      // bounded, adapts to workload shifts, and re-admits genuinely hot
      // patterns on their next miss.
      if (cache.size() >= MaxCacheSize) {
        val it = cache.keySet().iterator()
        if (it.hasNext) { it.next(); it.remove() }
      }
      cache.putIfAbsent(key, pat)
    }
    pat.matcher(s.toString).find()
  }
}

object RegexMatch {
  def column(str: Column, pattern: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      RegexMatch(org.apache.spark.sql.graft.Shims.expression(str),
        org.apache.spark.sql.graft.Shims.expression(pattern)))
}
