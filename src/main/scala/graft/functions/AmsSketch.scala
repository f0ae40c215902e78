package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}

/** AMS / Fast-AGMS sketch state (Alon-Matias-Szegedy '96; the hashed
  * "Fast-AGMS" layout of Cormode & Garofalakis '05): `depth` independent
  * rows × `width` SIGNED counters. Each item lands in one bucket per row
  * (Kirsch-Mitzenmacher double hashing, step forced odd — the
  * [[BloomState]]/[[CmsState]] probe discipline) and adds ±weight, the
  * sign drawn per (row, item) from an independent hash.
  *
  * What it answers that no other graft sketch can: the INNER PRODUCT of
  * two frequency vectors. For row r, Σ_j A[r][j]·B[r][j] is an unbiased
  * estimator of |A ⋈ B| = Σ_k cntA(k)·cntB(k) (collision cross-terms
  * cancel in expectation through the independent signs), with variance
  * ≤ 2·F2(A)·F2(B)/width; the median across rows tightens the tail.
  * Setting B = A gives the self-join size F2 — the skew moment.
  *
  * The 100 TB use is JOIN PLANNING: one cheap pass per table (or per
  * partition, merged — counter sums commute, so sketch bytes are
  * partitioning-invariant) yields join-size and skew estimates BEFORE
  * committing to a join strategy, where a misjudged fact⋈fact shuffles
  * terabytes. Complements [[ThetaSetKernel.intersectEstimate]] (distinct
  * overlap, no multiplicities) — AMS weighs the fanout.
  */
final class AmsState(val depth: Int, val width: Int) {
  require(depth > 0 && width > 0, s"bad AMS shape ($depth × $width)")
  require(depth <= 64, s"AMS depth $depth > 64 (sign bits come from one hash)")
  val counts = new Array[Long](depth * width)
  /** Total weight processed (diagnostics only; not part of estimates). */
  var processed: Long = 0L

  @inline private def index(h1: Long, h2: Long, row: Int): Int =
    row * width +
      java.lang.Math.floorMod(h1 + row * (h2 | 1L), width.toLong).toInt

  /** hs supplies one independent sign bit per row. */
  def add(h1: Long, h2: Long, hs: Long, weight: Long): Unit = {
    processed += weight
    var row = 0
    while (row < depth) {
      val sign = (((hs >>> row) & 1L) << 1) - 1L // ±1
      counts(index(h1, h2, row)) += sign * weight
      row += 1
    }
  }

  def mergeFrom(other: AmsState): Unit = {
    require(other.depth == depth && other.width == width,
      s"AMS merge shape mismatch: ($depth,$width) vs " +
        s"(${other.depth},${other.width})")
    processed += other.processed
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }
}

object AmsKernel {
  /** Seeds distinct from the Bloom (17/31), CMS (5441/9973) and
    * MinHash families so collision patterns stay independent. */
  val Seed1 = 27644437L
  val Seed2 = 115249L
  val SeedSign = 2147483659L

  val FormatTag: Int = 0xA3520000 | 1 // version 1

  def hash1(v: Any, dt: DataType): Long = XxHash64Function.hash(v, dt, Seed1)
  def hash2(v: Any, dt: DataType): Long = XxHash64Function.hash(v, dt, Seed2)
  def hashSign(v: Any, dt: DataType): Long =
    XxHash64Function.hash(v, dt, SeedSign)

  /** Layout: FormatTag, depth, width, processed, counts… */
  def serialize(state: AmsState): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 8 +
      8 * state.counts.length)
    buf.putInt(FormatTag)
    buf.putInt(state.depth)
    buf.putInt(state.width)
    buf.putLong(state.processed)
    state.counts.foreach(buf.putLong)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): AmsState = {
    require(bytes.length >= 4 + 4 + 4 + 8,
      s"AMS sketch bytes too short (${bytes.length})")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val tag = buf.getInt
    require(tag == FormatTag,
      f"AMS sketch format mismatch: stored 0x$tag%08x, this build reads " +
        f"0x$FormatTag%08x — rebuild the sketch")
    val state = new AmsState(buf.getInt, buf.getInt)
    state.processed = buf.getLong
    var i = 0
    while (i < state.counts.length) { state.counts(i) = buf.getLong; i += 1 }
    state
  }

  def merged(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = deserialize(a)
    sa.mergeFrom(deserialize(b))
    serialize(sa)
  }

  /** Median-of-rows inner-product estimate of Σ_k cntA(k)·cntB(k).
    * Unbiased per row; can be negative on tiny inputs (clamp at the
    * call site if a size is needed). Both sketches must have been built
    * over the SAME column type — xxhash64 of 5L and "5" differ. */
  def joinEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val sa = deserialize(a)
    val sb = deserialize(b)
    require(sa.depth == sb.depth && sa.width == sb.width,
      s"AMS estimate shape mismatch: (${sa.depth},${sa.width}) vs " +
        s"(${sb.depth},${sb.width})")
    val dots = new Array[Double](sa.depth)
    var row = 0
    while (row < sa.depth) {
      var dot = 0.0
      var j = row * sa.width
      val end = j + sa.width
      while (j < end) { dot += sa.counts(j).toDouble * sb.counts(j); j += 1 }
      dots(row) = dot
      row += 1
    }
    java.util.Arrays.sort(dots)
    val d = sa.depth
    if (d % 2 == 1) dots(d / 2) else (dots(d / 2 - 1) + dots(d / 2)) / 2.0
  }

  /** Self-join size F2 = Σ_k cnt(k)² — the skew second moment. */
  def selfJoinEstimate(a: Array[Byte]): Double = joinEstimate(a, a)
}

/** AMS sketch over an int/long/string column as a mergeable
  * TypedImperativeAggregate emitting serialized sketch bytes. Plan
  * shape: standard partial/final aggregate — each scan task folds its
  * rows into a depth×width partial, the shuffle moves one fixed-size
  * blob per group, merge is pointwise signed addition; bytes are
  * identical under any partitioning. */
case class AmsSketchBytes(
    child: Expression,
    depth: Int = 5,
    width: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[AmsState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ams_sketch needs an INT, BIGINT or STRING column, got ${other.sql}")
    }

  override def createAggregationBuffer(): AmsState = new AmsState(depth, width)

  override def update(state: AmsState, input: InternalRow): AmsState = {
    val v = child.eval(input)
    if (v != null) {
      state.add(AmsKernel.hash1(v, child.dataType),
        AmsKernel.hash2(v, child.dataType),
        AmsKernel.hashSign(v, child.dataType), 1L)
    }
    state
  }

  override def merge(state: AmsState, other: AmsState): AmsState = {
    state.mergeFrom(other); state
  }

  override def eval(state: AmsState): Any = AmsKernel.serialize(state)

  override def serialize(state: AmsState): Array[Byte] =
    AmsKernel.serialize(state)
  override def deserialize(bytes: Array[Byte]): AmsState =
    AmsKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): AmsSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): AmsSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AmsSketchBytes =
    copy(child = newChildren.head)
}

object AmsFunctions {
  import org.apache.spark.sql.functions.udf

  def ams_sketch(col: Column, depth: Int = 5, width: Int = 1024): Column =
    ColumnBridge.column(
      AmsSketchBytes(ColumnBridge.expression(col), depth, width)
        .toAggregateExpression())

  // Stored-sketch surface (runs once per sketch pair, not per row — the
  // UDF altitude is right, same reasoning as CmsFunctions).
  private val joinEstimateUdf =
    udf((a: Array[Byte], b: Array[Byte]) => AmsKernel.joinEstimate(a, b))
  private val selfJoinUdf =
    udf((a: Array[Byte]) => AmsKernel.selfJoinEstimate(a))
  private val mergeUdf =
    udf((a: Array[Byte], b: Array[Byte]) => AmsKernel.merged(a, b))

  /** Estimated |A ⋈ B| on the sketched key. */
  def ams_join_estimate(a: Column, b: Column): Column = joinEstimateUdf(a, b)
  /** Estimated F2 (self-join size / skew moment). */
  def ams_self_join(a: Column): Column = selfJoinUdf(a)
  /** Pointwise-sum two stored sketches of identical shape. */
  def ams_merge(a: Column, b: Column): Column = mergeUdf(a, b)
}
