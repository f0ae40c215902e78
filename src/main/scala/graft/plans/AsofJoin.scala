package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSeq, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, EmptyBlock, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.types._

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
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None, inner: Boolean = false,
    toleranceIsInterval: Boolean = false)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    if (inner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {

  /** Time types with a physical long behind them — the only ones a
    * tolerance bound can be computed against (micros for timestamps,
    * days for dates, raw for integral columns). */
  private[plans] def isToleranceTimeType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  /** Driver-side validation at plan time, where expressions are resolved
    * and dataTypes known (the API takes unresolved Columns, so this is
    * the earliest point the checks can run). Without this, a tolerance on
    * an unsupported time type or a left/right time-type mismatch would
    * surface as an executor-side failure (interpreted path) or a silently
    * wrong tolerance comparison (timeAsLong keys off leftTime only). */
  private def validate(j: AsofJoin): Unit = {
    require(j.leftKeys.length == j.rightKeys.length,
      s"asof join: ${j.leftKeys.length} left keys vs ${j.rightKeys.length} right keys")
    j.leftKeys.zip(j.rightKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"asof join: key type mismatch ${l.dataType.sql} vs ${r.dataType.sql} " +
          s"for keys ($l, $r)")
    }
    require(j.leftTime.dataType == j.rightTime.dataType,
      s"asof join: time type mismatch ${j.leftTime.dataType.sql} (left) vs " +
        s"${j.rightTime.dataType.sql} (right)")
    j.tolerance.foreach { t =>
      require(t >= 0, s"asof join: negative tolerance $t")
      require(isToleranceTimeType(j.leftTime.dataType),
        s"asof join: tolerance unsupported for time type " +
          s"${j.leftTime.dataType.sql} (needs an integral/date/timestamp column)")
    }
  }

  private val MicrosPerDay = 86400000000L

  /** An INTERVAL-form tolerance (stored as micros) converts to the time
    * column's physical units HERE — the earliest point the time type is
    * resolved: micros pass through for timestamps, whole days for DATE
    * columns; raw integral time columns have no physical duration, so an
    * interval against them is rejected rather than guessed. */
  private def physicalTolerance(j: AsofJoin): Option[Long] = j.tolerance.map { t =>
    if (!j.toleranceIsInterval) t
    else j.leftTime.dataType match {
      case TimestampType | TimestampNTZType => t
      case DateType =>
        require(t % MicrosPerDay == 0,
          s"asof join: interval tolerance over a DATE column must be a " +
            s"whole number of days, got ${t}us")
        t / MicrosPerDay
      case dt => throw new IllegalArgumentException(
        s"asof join: interval tolerance needs a date/timestamp time " +
          s"column; ${dt.sql} has no physical duration — pass a raw " +
          s"integral tolerance in the column's own units instead")
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ AsofJoin(l, r, lk, rk, lt, rt, _, inner, _) =>
      validate(j)
      AsofJoinExec(lk, rk, lt, rt, physicalTolerance(j), inner,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long], inner: Boolean,
    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    if (inner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

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

  // ------------------------------------------------- whole-stage codegen.
  // The join is the stage's INPUT node (like SortMergeJoinExec): both
  // children feed iterators into generated code that runs the same
  // forward merge as doExecute below, but fused with every downstream
  // operator in the stage — no per-row iterator virtual calls, no
  // JoinedRow, no result projection; left columns flow as local
  // variables straight into the consumer.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // right-side output vars read from a retained UnsafeRow copy that a
  // later merge step may overwrite — downstream buffering must copy
  override def needCopyResult: Boolean = true

  /** Codegen handles the key/time shapes the gate exercises (primitive,
    * string, date/time); anything exotic falls back to doExecute. A
    * tolerance additionally needs a time type with a physical long
    * behind it (timeAsLong below) — for any other time type codegen
    * would silently compare 0L-0L and ignore the bound, while the
    * interpreted path fails loudly (`require(tolOpt.isEmpty)`), so
    * those combinations must fall back. */
  override def supportCodegen: Boolean =
    (leftKeys ++ rightKeys).forall(k => isSupportedKeyType(k.dataType)) &&
      isSupportedKeyType(leftTime.dataType) &&
      (tolerance.isEmpty ||
        AsofJoinStrategy.isToleranceTimeType(leftTime.dataType))

  private def isSupportedKeyType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Lexicographic comparison of two evaluated var lists with the same
    * null semantics as RowOrdering.createNaturalAscendingOrdering:
    * null < any value, nulls compare equal. Emits into `comp`. */
  private def genCompare(ctx: CodegenContext, comp: String,
      a: Seq[ExprCode], b: Seq[ExprCode], dts: Seq[DataType]): String = {
    val steps = a.zip(b).zip(dts).map { case ((x, y), dt) =>
      s"""$comp = (${x.isNull} && ${y.isNull}) ? 0
         |  : ${x.isNull} ? -1 : ${y.isNull} ? 1
         |  : ${ctx.genComp(dt, x.value.toString, y.value.toString)};
         |if ($comp != 0) break;""".stripMargin
    }
    s"""do {
       |  ${steps.mkString("\n")}
       |} while (false);""".stripMargin
  }

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "leftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "rightInput",
      v => s"$v = inputs[1];")
    val rCur = ctx.addMutableState("InternalRow", "asofRightRow")
    val lastMatch = ctx.addMutableState("UnsafeRow", "asofLastMatch")
    val lastMatchTime = ctx.addMutableState(CodeGenerator.JAVA_LONG, "asofLastMatchTime")
    val prevValid = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofPrevKeyValid")

    val keyTypes = leftKeys.map(_.dataType)
    val leftRow = ctx.freshName("asofLeftRow")
    val comp = ctx.freshName("asofComp")

    // left key/time vars, evaluated from the current left row
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val lKeyVars = BindReferences
      .bindReferences(leftKeys, AttributeSeq(left.output)).map(_.genCode(ctx))
    val lTimeVar = BindReferences
      .bindReference(leftTime, AttributeSeq(left.output)).genCode(ctx)

    // previous left key, stored across rows to invalidate stale matches
    // (a retained match is only valid while the left key is unchanged)
    val prevKeyVars = keyTypes.zipWithIndex.map { case (dt, i) =>
      val isNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, s"asofPrevKeyNull$i")
      val value = ctx.addMutableState(CodeGenerator.javaType(dt), s"asofPrevKeyVal$i")
      ExprCode(EmptyBlock, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, dt))
    }
    val storePrevKey = prevKeyVars.zip(lKeyVars).zip(keyTypes).map {
      case ((p, l), dt) =>
        val cloned = dt match {
          case StringType => s"${l.value}.clone()"
          case _ => l.value.toString
        }
        s"""${p.isNull} = ${l.isNull};
           |${p.value} = ${p.isNull} ? ${CodeGenerator.defaultValue(dt)} : $cloned;"""
          .stripMargin
    }.mkString("\n")

    // right key/time vars, evaluated from the buffered right row
    ctx.INPUT_ROW = rCur
    val rKeyVars = BindReferences
      .bindReferences(rightKeys, AttributeSeq(right.output)).map(_.genCode(ctx))
    val rTimeVar = BindReferences
      .bindReference(rightTime, AttributeSeq(right.output)).genCode(ctx)

    // physical long behind the time column, for the tolerance bound
    def timeAsLong(v: ExprCode): String = leftTime.dataType match {
      case TimestampType | TimestampNTZType | LongType => v.value.toString
      case IntegerType | DateType => s"(long) ${v.value}"
      case _ => "0L"
    }

    // output vars: left columns from the live row, right columns from the
    // retained match (null-extended when unmatched)
    ctx.INPUT_ROW = leftRow
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val matchedRow = ctx.freshName("asofMatchedRow")
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofRIsNull")
      val value = ctx.freshName("asofRValue")
      val jt = CodeGenerator.javaType(a.dataType)
      ExprCode(
        code"""boolean $isNull = $matchedRow == null || $matchedRow.isNullAt($i);
              |$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)}
              |  : (${CodeGenerator.getValue(matchedRow, a.dataType, i.toString)});""".stripMargin,
        JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }

    val matched = ctx.freshName("asofMatched")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val tolCheck = tolerance.map { t =>
      s"if ($matched) $matched = ${timeAsLong(lTimeVar)} - $lastMatchTime <= ${t}L;"
    }.getOrElse("")
    val storeMatchTime = tolerance.map { _ =>
      s"$lastMatchTime = ${rTimeVar.isNull} ? 0L : ${timeAsLong(rTimeVar)};"
    }.getOrElse("")
    val emit =
      s"""InternalRow $matchedRow = $matched ? $lastMatch : null;
         |$numOutput.add(1);
         |${consume(ctx, leftVars ++ rightVars)}""".stripMargin
    val produceOutput =
      if (inner) s"""if ($matched) {
                    |  $emit
                    |}""".stripMargin
      else emit

    s"""while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lKeyVars.map(_.code.toString).mkString("\n")}
       |  ${lTimeVar.code}
       |  // invalidate a match retained from a different key
       |  int $comp = 0;
       |  if ($lastMatch != null) {
       |    if (!$prevValid) { $lastMatch = null; }
       |    else {
       |      ${genCompare(ctx, comp, prevKeyVars, lKeyVars, keyTypes)}
       |      if ($comp != 0) $lastMatch = null;
       |    }
       |  }
       |  $storePrevKey
       |  $prevValid = true;
       |  // advance the right side through all rows at-or-before the left
       |  // row, retaining the latest on-key one as the current best match
       |  while (true) {
       |    if ($rCur == null) {
       |      if ($rightInput.hasNext()) { $rCur = (InternalRow) $rightInput.next(); }
       |      else break;
       |    }
       |    ${rKeyVars.map(_.code.toString).mkString("\n")}
       |    ${genCompare(ctx, comp, rKeyVars, lKeyVars, keyTypes)}
       |    if ($comp < 0) { $rCur = null; continue; }  // stale key
       |    if ($comp == 0) {
       |      ${rTimeVar.code}
       |      int ${comp}t;
       |      ${genCompare(ctx, s"${comp}t", Seq(rTimeVar), Seq(lTimeVar), Seq(leftTime.dataType))}
       |      if (${comp}t <= 0) {
       |        $lastMatch = ((UnsafeRow) $rCur).copy();
       |        $storeMatchTime
       |        $rCur = null;
       |        continue;
       |      }
       |    }
       |    break;  // right side is ahead of this left row
       |  }
       |  boolean $matched = $lastMatch != null;
       |  $tolCheck
       |  $produceOutput
       |  if (shouldStop()) return;
       |}""".stripMargin
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val tolOpt = tolerance
    val innerMode = inner
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
      // tolerance works on the physical long behind the time column
      // (micros for TIMESTAMP, days for DATE, raw for integral)
      val timeGet: InternalRow => Long = timeType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType |
             org.apache.spark.sql.types.LongType => _.getLong(0)
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType => _.getInt(0).toLong
        case t =>
          require(tolOpt.isEmpty, s"asof tolerance unsupported for time type $t")
          _ => 0L
      }

      new Iterator[InternalRow] {
        private var rCur: InternalRow = _
        private var rCurKey: InternalRow = _
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _
        private var lastMatchTime: Long = 0L
        private var pending: InternalRow = _

        // One forward merge step per left row. For each left row the
        // right side advances while (a) behind on key or (b) on-key with
        // time <= left time — each such row becomes the current best
        // match (later rows win, matching "most recent"). A match only
        // joins if it is within `tolerance` of the left time; in inner
        // mode unmatched left rows are skipped instead of null-extended.
        private def computeNext(): InternalRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTime = lTimeProj(l)
            // a retained match is only valid for its own key
            if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lKey) != 0) {
              lastMatch = null; lastMatchKey = null
            }
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
                  if (tolOpt.isDefined) lastMatchTime = timeGet(rTimeProj(rCur))
                  rCur = null
                } else advance = false // right is ahead; stop
              }
            }
            val matched = lastMatch != null && (tolOpt.isEmpty ||
              timeGet(lTime) - lastMatchTime <= tolOpt.get)
            if (matched) {
              numOutputRows += 1
              return resultProj(joined(l, lastMatch))
            } else if (!innerMode) {
              numOutputRows += 1
              return resultProj(joined(l, nullRight))
            }
            // inner mode, no in-tolerance match: skip this left row
          }
          null
        }

        override def hasNext: Boolean = {
          if (pending == null) pending = computeNext()
          pending != null
        }

        override def next(): InternalRow = {
          if (pending == null) pending = computeNext()
          val out = pending
          pending = null
          out
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
    * row with equal keys and rightTime <= leftTime (left outer by
    * default). Column arguments must belong to the respective DataFrames.
    *
    * `tolerance` bounds how stale a match may be:
    * rightTime >= leftTime − tolerance, expressed in the time column's
    * physical units (MICROSECONDS for timestamps, days for dates, raw
    * for integral columns) — the contract a market-data or sensor as-of
    * needs ("ignore quotes older than 5 minutes"). Beyond semantics it
    * is the state-pruning bound: a streaming/stateful execution may
    * evict any right row older than watermark − tolerance, where the
    * untolerated join must retain the last row per key forever.
    * `inner = true` drops unmatched left rows instead of null-extending
    * them. */
  def joinAsof(left: DataFrame, right: DataFrame,
      leftKeys: Seq[org.apache.spark.sql.Column],
      rightKeys: Seq[org.apache.spark.sql.Column],
      leftTime: org.apache.spark.sql.Column,
      rightTime: org.apache.spark.sql.Column,
      tolerance: Option[Long] = None,
      inner: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    enable(spark)
    ColumnBridge.ofRows(spark, AsofJoin(
      ColumnBridge.plan(left), ColumnBridge.plan(right),
      leftKeys.map(ColumnBridge.expression),
      rightKeys.map(ColumnBridge.expression),
      ColumnBridge.expression(leftTime),
      ColumnBridge.expression(rightTime),
      tolerance, inner))
  }

  /** Timestamp-typed convenience: tolerance as a Duration. */
  def joinAsofTolerant(left: DataFrame, right: DataFrame,
      leftKeys: Seq[org.apache.spark.sql.Column],
      rightKeys: Seq[org.apache.spark.sql.Column],
      leftTime: org.apache.spark.sql.Column,
      rightTime: org.apache.spark.sql.Column,
      tolerance: java.time.Duration,
      inner: Boolean = false): DataFrame =
    joinAsof(left, right, leftKeys, rightKeys, leftTime, rightTime,
      Some(tolerance.toNanos / 1000L), inner)
}
