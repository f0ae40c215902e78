package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}

/** Native AS-OF join — the one operator in the target surface Spark
  * genuinely lacks (SURVEY §7.3 flagged it as the custom-strategy
  * candidate). For each left row, emit the LAST right row of the same
  * key with rightTime <= leftTime (left outer semantics).
  *
  * Physical algorithm: both sides hash-clustered on the key and sorted
  * by (key, time) — EnsureRequirements inserts the exchanges/sorts — then
  * ONE forward merge pass per partition with O(1) state (the single
  * current best match). Contrast with the composable formulation
  * (union + last_value window, operators.Relational.q21AsofJoin): same
  * shuffle count, but the window sweep materializes and sorts the union
  * while this streams both sides once — and it expresses the semantics
  * directly, so there is no risk of the union schema drifting.
  *
  * Demonstrates the full custom-operator stack: LogicalPlan node →
  * Strategy → SparkPlan, registered through SparkSessionExtensions /
  * experimental strategies (graft.plans.AsofJoinApi.enable).
  */
final case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  /** Same key ⇒ same partition on both sides (co-clustered like a
    * sort-merge join)... */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** ...and each partition arrives (key, time)-sorted, so the merge is a
    * single forward pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val numOutputRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rCur: InternalRow = _
        private var rCurKey: InternalRow = _
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          // a retained match is only valid for its own key
          if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lKey) != 0) {
            lastMatch = null; lastMatchKey = null
          }
          // advance the right side while it is (a) behind on key or
          // (b) on-key with time <= left time (each such row becomes the
          // current best match — later rows win, matching "most recent")
          var advance = true
          while (advance) {
            if (rCur == null && rIter.hasNext) {
              rCur = rIter.next()
              rCurKey = null
            }
            if (rCur == null) advance = false
            else {
              if (rCurKey == null) rCurKey = rKeyProj(rCur)
              val c = keyOrd.compare(rCurKey, lKey)
              if (c < 0) { rCur = null } // stale key, discard
              else if (c == 0 &&
                timeOrd.compare(rTimeProj(rCur), lTime) <= 0) {
                lastMatch = rCur.copy()
                lastMatchKey = rCurKey.copy()
                rCur = null
              } else advance = false // right is ahead; stop
            }
          }
          numOutputRows += 1
          resultProj(joined(l,
            if (lastMatch != null) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API + strategy registration. */
object AsofJoinApi {
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** leftDF as-of-joined to rightDF: for every left row, the latest right
    * row with equal keys and rightTime <= leftTime (left outer). Column
    * arguments must belong to the respective DataFrames. */
  def joinAsof(left: DataFrame, right: DataFrame,
      leftKeys: Seq[org.apache.spark.sql.Column],
      rightKeys: Seq[org.apache.spark.sql.Column],
      leftTime: org.apache.spark.sql.Column,
      rightTime: org.apache.spark.sql.Column): DataFrame = {
    val spark = left.sparkSession
    enable(spark)
    ColumnBridge.ofRows(spark, AsofJoin(
      ColumnBridge.plan(left), ColumnBridge.plan(right),
      leftKeys.map(ColumnBridge.expression),
      rightKeys.map(ColumnBridge.expression),
      ColumnBridge.expression(leftTime),
      ColumnBridge.expression(rightTime)))
  }
}
