package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Direction-extended as-of joins (pandas `merge_asof` directions):
  * `forward` — the EARLIEST right row at-or-after the left time — and
  * `nearest` — the closer of the backward and forward matches, ties to
  * the earlier row.
  *
  * Both are pure compositions over the verified native backward merge
  * (graft.plans.AsofJoin), not new physical operators:
  *
  *   - forward(t) is backward(−t): both time columns are projected to
  *     negated integral units (micros for timestamps, days for dates),
  *     the native merge runs unchanged, and the helper columns drop out.
  *     Same single co-partitioned pass, same O(1) merge state; the
  *     tolerance bound maps to the same units and becomes
  *     rightTime <= leftTime + tolerance, the "ignore fills later than
  *     5 minutes out" contract.
  *   - nearest is one backward pass then one forward pass over the
  *     backward result (right columns suffixed per side), then a
  *     per-row codegen'd choice of the closer match. Two merges, still
  *     zero extra shuffles beyond the two as-of co-partitionings; at
  *     100 TB both passes reuse the same key partitioning.
  *
  * Reusing the merge keeps every proof about the backward operator
  * (ordering, tolerance, co-partitioning) in force here — the
  * composition cannot diverge from it.
  */
object AsofDirectionsApi {

  /** A time column in integral units the merge can negate/compare:
    * micros for timestamps, days for dates, raw for integrals. */
  private def asLong(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => unix_micros(c)
    case DateType => unix_date(c).cast("long")
    case LongType | IntegerType | ShortType | ByteType => c.cast("long")
    case other => throw new IllegalArgumentException(
      s"as-of direction join: unsupported time type $other")
  }

  private def timeType(df: DataFrame, c: Column): DataType =
    df.select(c).schema.head.dataType

  /** For every left row, the EARLIEST right row with equal keys and
    * rightTime >= leftTime (left outer unless `inner`). `tolerance`
    * bounds how far ahead a match may be: rightTime <= leftTime +
    * tolerance, in micros for timestamps / days for dates / raw units
    * for integral time columns — mirroring the backward join's units. */
  def joinAsofForward(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      tolerance: Option[Long] = None, inner: Boolean = false): DataFrame = {
    val (lneg, rneg) = ("__asof_fwd_l", "__asof_fwd_r")
    val l2 = left.withColumn(lneg, -asLong(leftTime, timeType(left, leftTime)))
    val r2 = right.withColumn(rneg, -asLong(rightTime, timeType(right, rightTime)))
    AsofJoinApi.joinAsof(l2, r2, leftKeys, rightKeys, l2(lneg), r2(rneg),
      tolerance, inner).drop(lneg, rneg)
  }

  /** For every left row, whichever of the latest-at-or-before and
    * earliest-at-or-after right rows lies closer in time; equidistant
    * ties take the earlier (backward) row, matching the deterministic
    * tie rule everywhere else in the engine. Name-based API: `on` pairs
    * (leftKey, rightKey); right column names must not collide with
    * left's (the result carries both sides un-prefixed). `tolerance`
    * bounds the distance on BOTH sides. */
  def joinAsofNearest(left: DataFrame, right: DataFrame,
      on: Seq[(String, String)], leftTimeCol: String, rightTimeCol: String,
      tolerance: Option[Long] = None): DataFrame = {
    require(right.columns.toSet.intersect(left.columns.toSet).isEmpty,
      "joinAsofNearest: right column names must not collide with left's")
    val ldt = left.schema(leftTimeCol).dataType
    val rdt = right.schema(rightTimeCol).dataType
    def renamed(suffix: String): DataFrame =
      right.columns.foldLeft(right)((df, c) =>
        df.withColumnRenamed(c, c + suffix))
    val rb = renamed("__b")
    val rf = renamed("__f")
    val b = AsofJoinApi.joinAsof(left, rb,
      on.map(k => left(k._1)), on.map(k => rb(k._2 + "__b")),
      left(leftTimeCol), rb(rightTimeCol + "__b"), tolerance)
    val bf = joinAsofForward(b, rf,
      on.map(k => b(k._1)), on.map(k => rf(k._2 + "__f")),
      b(leftTimeCol), rf(rightTimeCol + "__f"), tolerance)
    val lt = asLong(col(leftTimeCol), ldt)
    val bt = asLong(col(rightTimeCol + "__b"), rdt)
    val ft = asLong(col(rightTimeCol + "__f"), rdt)
    val chooseB = bt.isNotNull && (ft.isNull || abs(lt - bt) <= abs(ft - lt))
    bf.select(left.columns.map(col).toSeq ++ right.columns.toSeq.map(rc =>
      when(chooseB, col(rc + "__b")).otherwise(col(rc + "__f")).as(rc)): _*)
  }
}
