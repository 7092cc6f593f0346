package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF join for two LARGE sides — the operator Spark lacks.
  *
  * Semantics: for every left row, attach the single right row with the
  * same key whose time is the greatest time ≤ the left row's time
  * (LEFT OUTER: unmatched left rows keep nulls on the right). The
  * reference's analogue is "config/device-state active at event time".
  *
  * For a SMALL right side graft uses a broadcast interval join
  * (graft.queries.Events.evtAsof) — compose-built-ins wins there. When
  * BOTH sides are large that trick dies (the interval table is no
  * longer broadcastable and the union+window rewrite costs two shuffles
  * plus a giant window sort). This operator is a sort-merge as-of:
  * both sides hash-cluster on the key and sort by (key, time) — the
  * SAME distribution a regular sort-merge join needs — then one linear
  * merge pass per partition attaches the latest-≤ right row. Cost is
  * identical to an equi sort-merge join at any scale.
  *
  * v1 scope: key and time are LongType columns (epoch seconds / ids).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec. Injected via
  * GraftExtensions (injectPlannerStrategy). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Same requirements as a sort-merge equi join: cluster on key, sort
    * by (key, time). EnsureRequirements inserts the exchanges/sorts. */
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = leftKey
    val lt = leftTime
    val rk = rightKey
    val rt = rightTime
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkEval = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(lk, leftOutput)
      val ltEval = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(lt, leftOutput)
      val rkEval = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rk, rightOutput)
      val rtEval = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rt, rightOutput)
      // input schema must carry the OUTER nullability: binding against
      // the right side's original (non-nullable) attrs would elide null
      // checks and read 0 from the null-row slots
      val proj = UnsafeProjection.create(allOutput, allOutput)
      val nullRight = new GenericInternalRow(rightOutput.length)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // latest right row (copied) for the key currently being merged
      var matchKey = 0L
      var hasMatch = false
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val keyV = lkEval.eval(lRow)
        val timeV = ltEval.eval(lRow)
        // SQL as-of semantics: a NULL key or time never matches
        // (asInstanceOf[Long] on null would silently unbox to 0 and
        // spuriously match key-0 rows)
        if (keyV == null || timeV == null) {
          proj(joined(lRow, nullRight))
        } else {
          val key = keyV.asInstanceOf[Long]
          val time = timeV.asInstanceOf[Long]
          if (hasMatch && matchKey != key) { hasMatch = false; matchRow = null }
          // advance the right side up to (key, time)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hKeyV = rkEval.eval(head)
            val hTimeV = rtEval.eval(head)
            if (hKeyV == null || hTimeV == null) {
              rBuf.next() // null-keyed right rows can never match
            } else {
              val hKey = hKeyV.asInstanceOf[Long]
              val hTime = hTimeV.asInstanceOf[Long]
              if (hKey < key || (hKey == key && hTime <= time)) {
                if (hKey == key) {
                  matchRow = rBuf.next().copy() // candidate: latest ≤ time
                  matchKey = key
                  hasMatch = true
                } else {
                  rBuf.next() // different (smaller) key: discard
                }
              } else advancing = false
            }
          }
          if (hasMatch && matchKey == key) proj(joined(lRow, matchRow))
          else proj(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  import org.apache.spark.sql.DataFrame

  /** Dataset-level API: asof-join `left` with `right` on equal key with
    * the latest rightTime ≤ leftTime (left outer). Key/time columns must
    * be LongType and are resolved BY NAME against each side's analyzed
    * output here — a Column would carry an unresolved ColumnNode that
    * the analyzer does not resolve inside a foreign logical node.
    * Requires a session with GraftExtensions (the planner strategy). */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.graft.Shims
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val lp = Shims.plan(left)
    val rp = Shims.plan(right)
    // narrower integral columns are widened to Long at construction —
    // the exec evals keys as Long, and a task-time ClassCastException
    // on an int column is a terrible failure mode
    def attr(p: LogicalPlan, side: String, n: String): Expression = {
      val matches = p.output.filter(_.name == n)
      // post-join plans commonly carry duplicate names — silently taking
      // the first would join on the wrong side's column
      if (matches.size > 1) throw new IllegalArgumentException(
        s"asof: ambiguous column '$n' on the $side side " +
          s"(${matches.size} attributes match; alias one before joining)")
      val a: Attribute = matches.headOption
        .getOrElse(throw new IllegalArgumentException(
          s"asof: no column '$n' on the $side side " +
            s"(have ${p.output.map(_.name).mkString(", ")})"))
      a.dataType match {
        case LongType => a
        case ByteType | ShortType | IntegerType => Cast(a, LongType)
        case other => throw new IllegalArgumentException(
          s"asof: column '$n' must be an integral type (epoch seconds / " +
            s"ids), got ${other.catalogString}")
      }
    }
    Shims.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp,
        attr(lp, "left", leftKey), attr(lp, "left", leftTime),
        attr(rp, "right", rightKey), attr(rp, "right", rightTime)))
  }
}
