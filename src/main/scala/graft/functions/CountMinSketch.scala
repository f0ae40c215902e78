package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch state (Cormode & Muthukrishnan '05): `depth` hash
  * rows × `width` counters. An item increments one counter per row
  * (double hashing — Kirsch–Mitzenmacher index h1 + row·h2, step forced
  * odd like [[BloomState]] so a power-of-two width never collapses the
  * probe sequence to a coset); a point query reads the MIN across rows.
  *
  * Guarantees: estimates NEVER undercount (each counter is true count +
  * non-negative collision mass), and per query
  * P(est > true + e·N/width) ≤ e^−depth. Merge is pointwise counter
  * addition — commutative and associative, so a sketch built from the
  * same multiset is BYTE-IDENTICAL however the rows were partitioned
  * (same property the specs pin for [[BloomState]]).
  *
  * Complements the other graft sketches: theta answers "how many
  * distinct", KLL "what quantile", Misra–Gries "which items are
  * frequent" (it RETAINS ≤ k items); count-min answers "how often does
  * THIS item occur" for arbitrary later-chosen items, in O(depth·width)
  * space independent of vocabulary size — the per-token/domain/URL
  * frequency service a 100 TB curation pipeline queries after one pass.
  */
final class CmsState(val depth: Int, val width: Int) {
  require(depth > 0 && width > 0, s"bad CMS shape ($depth × $width)")
  val counts = new Array[Long](depth * width)
  /** Total weight processed (the N of the e·N/width error bound). */
  var processed: Long = 0L

  @inline private def index(h1: Long, h2: Long, row: Int): Int =
    row * width +
      java.lang.Math.floorMod(h1 + row * (h2 | 1L), width.toLong).toInt

  def add(h1: Long, h2: Long, weight: Long): Unit = {
    processed += weight
    var row = 0
    while (row < depth) {
      counts(index(h1, h2, row)) += weight
      row += 1
    }
  }

  def estimate(h1: Long, h2: Long): Long = {
    var min = Long.MaxValue
    var row = 0
    while (row < depth) {
      val c = counts(index(h1, h2, row))
      if (c < min) min = c
      row += 1
    }
    min
  }

  def mergeFrom(other: CmsState): Unit = {
    require(other.depth == depth && other.width == width,
      s"CMS merge shape mismatch: ($depth,$width) vs " +
        s"(${other.depth},${other.width})")
    processed += other.processed
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }
}

object CmsKernel {
  /** Seeds distinct from BloomKernel's so the two sketch families'
    * collision patterns are independent even over the same keys. */
  val Seed1 = 5441L
  val Seed2 = 9973L

  /** Negative magic+version tag, same reader contract as
    * [[BloomKernel.FormatTag]]: serialized sketches from a different
    * layout/probe generation are rejected with a typed error instead of
    * silently estimated against the wrong probe sequence. */
  val FormatTag: Int = 0xC3530000 | 1 // version 1

  def hash1(v: Any, dt: DataType): Long = XxHash64Function.hash(v, dt, Seed1)
  def hash2(v: Any, dt: DataType): Long = XxHash64Function.hash(v, dt, Seed2)

  /** Layout: FormatTag, depth, width, processed, counts… */
  def serialize(state: CmsState): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 8 +
      8 * state.counts.length)
    buf.putInt(FormatTag)
    buf.putInt(state.depth)
    buf.putInt(state.width)
    buf.putLong(state.processed)
    state.counts.foreach(buf.putLong)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): CmsState = {
    require(bytes.length >= 4 + 4 + 4 + 8,
      s"CMS sketch bytes too short (${bytes.length})")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val tag = buf.getInt
    require(tag == FormatTag,
      f"CMS sketch format mismatch: stored 0x$tag%08x, this build reads " +
        f"0x$FormatTag%08x — rebuild the sketch")
    val state = new CmsState(buf.getInt, buf.getInt)
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

  def estimateString(bytes: Array[Byte], item: String): Long = {
    val v = UTF8String.fromString(item)
    deserialize(bytes).estimate(
      hash1(v, StringType), hash2(v, StringType))
  }
}

/** Count-min sketch over a STRING column as a mergeable
  * TypedImperativeAggregate emitting the serialized sketch bytes.
  * Plan shape: normal partial/final aggregate — each scan task builds a
  * depth×width partial, the shuffle carries one fixed-size byte blob per
  * group, the final merge is pointwise addition. State is O(depth·width)
  * regardless of vocabulary size, and the result is byte-identical under
  * any partitioning (merge = commutative counter sums). */
case class CmsSketchBytes(
    child: Expression,
    depth: Int = 4,
    width: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cms_sketch needs a STRING column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): CmsState = new CmsState(depth, width)

  override def update(state: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v != null) {
      state.add(CmsKernel.hash1(v, child.dataType),
        CmsKernel.hash2(v, child.dataType), 1L)
    }
    state
  }

  override def merge(state: CmsState, other: CmsState): CmsState = {
    state.mergeFrom(other); state
  }

  override def eval(state: CmsState): Any = CmsKernel.serialize(state)

  override def serialize(state: CmsState): Array[Byte] =
    CmsKernel.serialize(state)
  override def deserialize(bytes: Array[Byte]): CmsState =
    CmsKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchBytes =
    copy(child = newChildren.head)
}

object CmsFunctions {
  import org.apache.spark.sql.functions.udf

  def cms_sketch(col: Column, depth: Int = 4, width: Int = 1024): Column =
    ColumnBridge.column(
      CmsSketchBytes(ColumnBridge.expression(col), depth, width)
        .toAggregateExpression())

  // Stored-sketch surface: runs once per (group, item) — plain UDFs are
  // the right altitude (same reasoning as ThetaSketchFunctions); the
  // per-ROW hot path is the aggregate above, not these.
  private val estimateUdf =
    udf((bytes: Array[Byte], item: String) =>
      CmsKernel.estimateString(bytes, item))
  private val mergeUdf =
    udf((a: Array[Byte], b: Array[Byte]) => CmsKernel.merged(a, b))
  private val processedUdf =
    udf((bytes: Array[Byte]) => CmsKernel.deserialize(bytes).processed)

  /** Point frequency estimate for a string item: ≥ the true count,
    * ≤ true + e·N/width with probability 1 − e^−depth. */
  def cms_estimate(sketch: Column, item: Column): Column =
    estimateUdf(sketch, item)
  /** Pointwise-sum two stored sketches of identical shape. */
  def cms_merge(a: Column, b: Column): Column = mergeUdf(a, b)
  /** Total weight the sketch has seen (the N of the error bound). */
  def cms_processed(sketch: Column): Column = processedUdf(sketch)
}
