package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Mutable KMV state: the `k` smallest distinct hash values seen, under
  * UNSIGNED 64-bit order (hashes are uniform over the full u64 space).
  * Backed by a TreeSet for O(log k) insert with cheap max-eviction. */
final class KmvState(val k: Int) {
  val heap = new java.util.TreeSet[java.lang.Long](
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  def insert(h: Long): Unit = {
    if (heap.size < k) { heap.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, heap.last) < 0) {
      if (heap.add(h)) heap.pollLast()
      ()
    }
  }

  def mergeFrom(other: KmvState): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) insert(it.next())
  }

  /** (k−1)/θ estimator: exact below k, else scale by the fraction of
    * hash space below the k-th minimum. */
  def estimate: Long =
    if (heap.size < k) heap.size.toLong
    else {
      // θ = unsigned kth-min / 2^64
      val last = heap.last.longValue()
      val x = last.toDouble + (if (last < 0) 1.8446744073709552e19 else 0.0)
      val theta = x / 1.8446744073709552e19
      math.round((k - 1) / math.max(theta, Double.MinPositiveValue))
    }
}

/** Approximate COUNT(DISTINCT) as a native TypedImperativeAggregate — a
  * K-Minimum-Values theta sketch (Bar-Yossef et al.; the core of the
  * theta-sketch family). Properties that matter at cluster scale:
  *
  *  - MERGEABLE state: partial sketches union losslessly (union of KMV
  *    sets, re-trimmed to k), so the plan is a normal partial/final
  *    aggregate — map-side combine works, shuffle carries ≤ k longs per
  *    group, and sketches persisted from different jobs can be merged.
  *  - DETERMINISTIC: hashes are Spark's xxhash64 (seed 42), so the
  *    estimate is a pure function of the value set — stable across
  *    runs, partitionings, and cluster sizes.
  *  - Error ~ 1/√(k−2): k=256 ⇒ ~6.3% RSE; exact below k distincts.
  *
  * Contrast with `approx_count_distinct` (HLL++): same plan shape; KMV
  * additionally yields θ (needed for set-expression sketches —
  * intersection/difference estimates) and demonstrates the
  * TypedImperativeAggregate surface the reference's users would extend.
  */
case class ThetaDistinct(
    child: Expression,
    k: Int = 256,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(state: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) state.insert(XxHash64Function.hash(v, child.dataType, 42L))
    state
  }

  override def merge(state: KmvState, other: KmvState): KmvState = {
    state.mergeFrom(other); state
  }

  override def eval(state: KmvState): Any = state.estimate

  override def serialize(state: KmvState): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * state.heap.size)
    buf.putInt(state.k)
    state.heap.forEach(h => { buf.putLong(h); () })
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val buf = ByteBuffer.wrap(bytes)
    val state = new KmvState(buf.getInt)
    while (buf.remaining() >= 8) state.insert(buf.getLong)
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaDistinct =
    copy(child = newChildren.head)
}

/** Sketch-state plumbing for SET EXPRESSIONS: [[ThetaSketchBytes]]
  * aggregates a column into the serialized KMV state (a BINARY value a
  * user can store, ship between jobs, and combine later), and the
  * scalar kernels below estimate over one or two stored sketches —
  * the capability HLL lacks and the reason to keep θ around:
  * |A ∩ B| ≈ |{h ∈ Sa ∩ Sb : h < θ}| / θ with θ = min(θa, θb). */
object ThetaSetKernel {
  private def frac(l: Long): Double = {
    val d = l.toDouble
    (if (l < 0) d + 1.8446744073709552e19 else d) / 1.8446744073709552e19
  }

  def deserialize(bytes: Array[Byte]): KmvState = {
    val buf = ByteBuffer.wrap(bytes)
    val state = new KmvState(buf.getInt)
    while (buf.remaining() >= 8) state.insert(buf.getLong)
    state
  }

  def serialize(state: KmvState): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * state.heap.size)
    buf.putInt(state.k)
    state.heap.forEach(h => { buf.putLong(h); () })
    buf.array()
  }

  private def theta(s: KmvState): Double =
    if (s.heap.size < s.k) 1.0 else frac(s.heap.last.longValue())

  def estimate(bytes: Array[Byte]): Long = deserialize(bytes).estimate

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = deserialize(a)
    sa.mergeFrom(deserialize(b))
    serialize(sa)
  }

  /** KMV intersection estimator over two stored sketches. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val sa = deserialize(a)
    val sb = deserialize(b)
    val th = math.min(theta(sa), theta(sb))
    var inter = 0
    val it = sa.heap.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (frac(h) < th || th == 1.0) if (sb.heap.contains(h)) inter += 1
    }
    math.round(inter / th)
  }

  /** KMV set-difference estimator |A \ B|: sample A's retained hashes
    * below the joint θ and count the ones absent from B — the same
    * θ-resample argument as intersection (both sketches see everything
    * below min θ, so membership tests there are exact). Completes the
    * set algebra: union, intersection, difference. */
  def differenceEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val sa = deserialize(a)
    val sb = deserialize(b)
    val th = math.min(theta(sa), theta(sb))
    var only = 0
    val it = sa.heap.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (frac(h) < th || th == 1.0) if (!sb.heap.contains(h)) only += 1
    }
    math.round(only / th)
  }
}

/** Same KMV aggregate, but emitting the serialized sketch itself. */
case class ThetaSketchBytes(
    child: Expression,
    k: Int = 256,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(state: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) state.insert(XxHash64Function.hash(v, child.dataType, 42L))
    state
  }

  override def merge(state: KmvState, other: KmvState): KmvState = {
    state.mergeFrom(other); state
  }

  override def eval(state: KmvState): Any = ThetaSetKernel.serialize(state)

  override def serialize(state: KmvState): Array[Byte] =
    ThetaSetKernel.serialize(state)
  override def deserialize(bytes: Array[Byte]): KmvState =
    ThetaSetKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchBytes =
    copy(child = newChildren.head)
}

object ThetaSketchFunctions {
  import org.apache.spark.sql.functions.udf

  def theta_distinct(col: Column, k: Int = 256): Column =
    ColumnBridge.column(
      ThetaDistinct(ColumnBridge.expression(col), k).toAggregateExpression())

  def theta_sketch(col: Column, k: Int = 256): Column =
    ColumnBridge.column(
      ThetaSketchBytes(ColumnBridge.expression(col), k).toAggregateExpression())

  // Scalar set-expression surface. These run once per GROUP (sketch
  // values, not rows), so compiled-closure dispatch is fine — no
  // per-row hot path to protect with a native Expression.
  private val estimateUdf = udf((b: Array[Byte]) => ThetaSetKernel.estimate(b))
  private val unionUdf =
    udf((a: Array[Byte], b: Array[Byte]) => ThetaSetKernel.union(a, b))
  private val intersectUdf =
    udf((a: Array[Byte], b: Array[Byte]) => ThetaSetKernel.intersectEstimate(a, b))
  private val differenceUdf =
    udf((a: Array[Byte], b: Array[Byte]) => ThetaSetKernel.differenceEstimate(a, b))

  def theta_estimate(sketch: Column): Column = estimateUdf(sketch)
  def theta_union(a: Column, b: Column): Column = unionUdf(a, b)
  def theta_intersect_estimate(a: Column, b: Column): Column = intersectUdf(a, b)
  def theta_difference_estimate(a: Column, b: Column): Column = differenceUdf(a, b)
}
