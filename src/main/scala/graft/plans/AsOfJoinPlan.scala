package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class Catalyst citizen — the (c)
  * extension tier from SURVEY §0: custom LogicalPlan → SparkStrategy →
  * SparkPlan, complementing the composed union+window form in
  * operators.AsOfJoin (which remains the default; see its Scaladoc for why
  * composition is usually enough).
  *
  * What the native operator buys over the composition:
  *  - no union materialization: left rows never widen to carry null
  *    payload slots through the sort, right rows never carry null left
  *    columns — the shuffle moves each side's own schema only;
  *  - the per-partition "carry the last right row forward" is a true
  *    single-pass streaming merge with O(1) state (one candidate payload),
  *    instead of a window frame the optimizer must prove unbounded-
  *    preceding;
  *  - Spark still owns distribution + ordering: the exec declares
  *    ClusteredDistribution on the keys and per-partition (key, ts)
  *    ordering, and EnsureRequirements inserts the exchanges/sorts exactly
  *    like it would for a SortMergeJoin — at 100 TB the plan is one hash
  *    exchange per side + in-partition sort, identical shuffle volume to
  *    the composed form minus the null padding.
  *
  * Semantics (kept bit-identical to operators.AsOfJoin.asOf, which the
  * spec asserts): each left row picks up the payload of the latest right
  * row with the same key and rightTs <= leftTs; equal-ts right rows
  * resolve to the largest tie value; left rows with no qualifying right
  * row (or a null left timestamp) get all-null payload; null-ts right
  * rows are dropped up front; null keys group together (window-partition
  * semantics, not SQL-join null semantics).
  */
case class AsOfJoinPlan(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    tie: Expression,
    payload: Seq[NamedExpression],
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.toAttribute.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; a no-op for everything
  * else. Injected per-session by `GraftStrategies.ensure` (or via
  * `GraftExtensions` at builder time). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.rightKey, p.leftTs, p.rightTs, p.tie,
        p.payload, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

object GraftStrategies {
  /** Idempotently add the graft planner strategies to a live session. */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }
}

/** DataFrame entry point for the native as-of join — same signature and
  * bit-identical semantics as `operators.AsOfJoin.asOf` (the composed
  * union+window form, which stays the default; AsOfJoinPlanSpec pins
  * equality across the full semantic matrix). Use this form when the null
  * padding of the union materially widens the shuffle — wide left schemas
  * against wide right payloads. */
object NativeAsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String, tieCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"payload columns ${payload.filter(leftCols.contains)} collide with left columns; alias them first")
    val spark = left.sparkSession
    GraftStrategies.ensure(spark)
    val lPlan = org.apache.spark.sql.graftshim.PlanBridge.analyzed(left)
    // self-join safety: re-alias the right side when attribute ids overlap
    // with the left (BindReferences would otherwise bind ambiguously)
    val rightPlan0 = org.apache.spark.sql.graftshim.PlanBridge.analyzed(right)
    val rPlan =
      if (rightPlan0.outputSet.intersect(lPlan.outputSet).isEmpty) rightPlan0
      else org.apache.spark.sql.graftshim.PlanBridge.analyzed(
        right.select(right.columns.map(c =>
          org.apache.spark.sql.functions.col(c).as(c)): _*))
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column '$name' not found among ${plan.output.map(_.name)}"))
    org.apache.spark.sql.graftshim.PlanBridge.ofRows(spark, AsOfJoinPlan(
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      attr(rPlan, tieCol), payload.map(attr(rPlan, _)),
      lPlan, rPlan))
  }
}

/** Streaming-merge as-of join executor. Children arrive hash-clustered on
  * their key and sorted by (key, ts[, tie]) — declared below, enforced by
  * EnsureRequirements — so each partition is a one-pass merge holding a
  * single candidate payload row. */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    tie: Expression, payload: Seq[NamedExpression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.toAttribute.withNullability(true))

  // left rows pass through untouched (payload appends on the right), so
  // the left child's partitioning and ordering survive for downstream use
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(tie, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val payloadExprs = payload
    val outAttrs = output
    val lOut = left.output
    val rOut = right.output
    val lKeyE = leftKey; val lTsE = leftTs
    val rKeyE = rightKey; val rTsE = rightTs
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      // nulls-first comparison, matching the SortOrder the children honored
      def cmp(ord: Ordering[Any], a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else ord.compare(a, b)
      val lKeyB = BindReferences.bindReference(lKeyE, lOut)
      val lTsB = BindReferences.bindReference(lTsE, lOut)
      val rKeyB = BindReferences.bindReference(rKeyE, rOut)
      val rTsB = BindReferences.bindReference(rTsE, rOut)
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPayload = InternalRow.fromSeq(Seq.fill(payloadExprs.size)(null))
      val joined = new JoinedRow
      var rRow: InternalRow = null      // right lookahead, not yet consumed
      var cand: InternalRow = null      // latest qualifying payload (copied)
      var candKey: Any = null
      lIter.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTsB.eval(l)
        if (cand != null && cmp(keyOrd, candKey, lk) != 0) cand = null
        var advance = true
        while (advance) {
          if (rRow == null && rIter.hasNext) rRow = rIter.next()
          if (rRow == null) advance = false
          else {
            val rk = rKeyB.eval(rRow)
            val c = cmp(keyOrd, rk, lk)
            if (c < 0) rRow = null // right key exhausted before this left key
            else if (c > 0) advance = false
            else {
              val rt = rTsB.eval(rRow)
              if (rt == null) rRow = null // dropped by contract
              else if (lt != null && cmp(tsOrd, rt, lt) <= 0) {
                cand = payloadProj(rRow).copy()
                // deep-copy: for non-primitive keys eval returns a view into
                // the iterator's reused row buffer
                candKey = InternalRow.copyValue(rk)
                rRow = null
              } else advance = false
            }
          }
        }
        joined(l, if (lt != null && cand != null) cand else nullPayload)
        resultProj(joined)
      }
    }
  }
}
