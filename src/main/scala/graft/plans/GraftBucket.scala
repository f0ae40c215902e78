package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-published V2 `bucket` function behind storage-partitioned
  * joins over graft CoW tables. Two scans may only be planned as
  * co-partitioned when Spark can prove both sides' files were routed by
  * the SAME function — the proof is this function's `canonicalName`
  * plus the bucket count, compared across the two
  * `TransformExpression`s. The id is `floorMod(xxhash64(value), n)` at
  * xxhash64's default seed — exactly the `pmod(xxhash64(col), n)`
  * expression [[graft.operators.CowTable.initBucketed]] routes writes
  * with, so the ids stamped into the manifest and the ids the optimizer
  * reasons about agree by construction (spec-pinned per type).
  *
  * canonicalName carries the VALUE TYPE: xxhash64 is type-tagged (the
  * integer 5 hashes differently as int and bigint), so declaring an
  * int-bucketed and a bigint-bucketed table co-partitioned would
  * mis-align their groups and JOIN WRONG PARTITIONS — a correctness
  * cliff, not a planning preference. Distinct canonical names make the
  * optimizer fall back to a shuffle instead. */
object GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): graft's bucket id — floorMod(xxhash64(col), n)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, value), got ${inputType.catalogString}")
    GraftBucketFunction(inputType.fields(1).dataType)
  }
}

case class GraftBucketFunction(valueType: DataType)
    extends ScalarFunction[Int] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String =
    s"graft.bucket(${valueType.catalogString})"
  override def isDeterministic: Boolean = true
  override def produceResult(input: InternalRow): Int = {
    val n = input.getInt(0)
    GraftBucket.bucketId(
      if (input.isNullAt(1)) null else input.get(1, valueType),
      valueType, n)
  }
}

object GraftBucket {
  /** xxhash64's default seed — what the builtin `xxhash64(col)` uses,
    * and what it RETURNS UNCHANGED for a null input (the builtin folds
    * nulls into the running seed), so null keys bucket consistently on
    * both the write and the reasoning side. */
  val Seed = 42L

  def bucketId(v: Any, dt: DataType, n: Int): Int =
    java.lang.Math.floorMod(
      if (v == null) Seed else XxHash64Function.hash(v, dt, Seed),
      n.toLong).toInt
}
