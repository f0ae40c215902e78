package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra–Gries heavy-hitters state: at most `k` counters.
  *
  * Guarantees (classic MG, preserved under the PODS'12 merge below):
  * for every item with true count c over N processed values, the stored
  * counter ĉ satisfies c − N/(k+1) ≤ ĉ ≤ c, and every item with
  * c > N/(k+1) is present. The ESTIMATES depend on processing order and
  * partitioning (like any counter-based summary); the bounds do not —
  * which is why the gate query asserts the envelope, not raw equality.
  */
final class MgState(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)
  /** Total weight processed (the N of the error bound). */
  var processed: Long = 0L

  def insert(item: String): Unit = {
    processed += 1
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + 1)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      // decrement-all: pays back one earlier increment per surviving
      // counter, so inserts stay amortized O(1)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Mergeable-summaries merge (Agarwal et al., PODS'12): sum counters
    * pointwise, then if over capacity subtract the (k+1)-th largest
    * value from every counter and drop the non-positive ones. Total
    * error stays ≤ N/(k+1) for the COMBINED N. */
  def mergeFrom(other: MgState): Unit = {
    processed += other.processed
    other.counts.forEach { (item, c) =>
      val cur = counts.get(item)
      counts.put(item, cur + c)
      ()
    }
    if (counts.size > k) {
      val values = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      val cut = values(values.length - k - 1) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  /** Counters sorted by (count desc, item asc) — deterministic emission
    * order for a given counter set. */
  def sorted: Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy { case (item, c) => (-c, item) }
  }
}

object MgKernel {
  def serialize(state: MgState): Array[Byte] = {
    var bytes = 0
    state.counts.forEach { (item, _) =>
      bytes += 12 + item.getBytes(StandardCharsets.UTF_8).length
    }
    val buf = java.nio.ByteBuffer.allocate(16 + bytes)
    buf.putInt(state.k)
    buf.putLong(state.processed)
    buf.putInt(state.counts.size)
    state.counts.forEach { (item, c) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      buf.putInt(b.length)
      buf.put(b)
      buf.putLong(c)
      ()
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): MgState = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val state = new MgState(buf.getInt)
    state.processed = buf.getLong
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val b = new Array[Byte](len)
      buf.get(b)
      state.counts.put(new String(b, StandardCharsets.UTF_8), buf.getLong)
      i += 1
    }
    state
  }

  def merged(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = deserialize(a)
    sa.mergeFrom(deserialize(b))
    serialize(sa)
  }

  val itemType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false)))

  def toCatalyst(state: MgState): GenericArrayData =
    new GenericArrayData(state.sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any])
}

/** Heavy hitters (approximate top-k frequent items) as a mergeable
  * TypedImperativeAggregate — the third graft sketch next to
  * [[ThetaDistinct]] (distincts) and [[KllQuantile]] (quantiles),
  * covering the remaining "what are the frequent tokens/domains/ngrams"
  * question a corpus-curation pipeline asks at 100 TB.
  *
  * Plan shape is a normal partial/final aggregate: map-side partial MG
  * summaries of ≤ k counters each, shuffle carries ≤ k (string, long)
  * pairs per group, final merge preserves the N/(k+1) error bound for
  * the combined stream (mergeable-summaries construction). Returns
  * array<struct<item,est>> sorted by (est desc, item asc).
  */
case class HeavyHitters(
    child: Expression,
    k: Int = 64,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(MgKernel.itemType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters needs a STRING column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): MgState = new MgState(k)

  override def update(state: MgState, input: InternalRow): MgState = {
    val v = child.eval(input)
    // UTF8String buffers may be reused by the scan — materialize a copy
    if (v != null) state.insert(v.asInstanceOf[UTF8String].toString)
    state
  }

  override def merge(state: MgState, other: MgState): MgState = {
    state.mergeFrom(other); state
  }

  override def eval(state: MgState): Any = MgKernel.toCatalyst(state)

  override def serialize(state: MgState): Array[Byte] = MgKernel.serialize(state)
  override def deserialize(bytes: Array[Byte]): MgState = MgKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

/** Same MG aggregate emitting the serialized state — a BINARY sketch a
  * user can store per shard/day and combine later, symmetric with
  * [[ThetaSketchBytes]] and [[KllSketchBytes]]. */
case class HeavyHittersSketchBytes(
    child: Expression,
    k: Int = 64,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): MgState = new MgState(k)

  override def update(state: MgState, input: InternalRow): MgState = {
    val v = child.eval(input)
    if (v != null) state.insert(v.asInstanceOf[UTF8String].toString)
    state
  }

  override def merge(state: MgState, other: MgState): MgState = {
    state.mergeFrom(other); state
  }

  override def eval(state: MgState): Any = MgKernel.serialize(state)

  override def serialize(state: MgState): Array[Byte] = MgKernel.serialize(state)
  override def deserialize(bytes: Array[Byte]): MgState = MgKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersSketchBytes =
    copy(child = newChildren.head)
}

object HeavyHitterFunctions {
  import org.apache.spark.sql.functions.udf

  def heavy_hitters(col: Column, k: Int = 64): Column =
    ColumnBridge.column(
      HeavyHitters(ColumnBridge.expression(col), k).toAggregateExpression())

  def heavy_hitters_sketch(col: Column, k: Int = 64): Column =
    ColumnBridge.column(
      HeavyHittersSketchBytes(ColumnBridge.expression(col), k)
        .toAggregateExpression())

  // Stored-sketch surface: once per group, not per row — plain UDFs are
  // the right altitude (same reasoning as ThetaSketchFunctions).
  private val mergeUdf =
    udf((a: Array[Byte], b: Array[Byte]) => MgKernel.merged(a, b))
  private val itemsUdf = udf((bytes: Array[Byte]) =>
    MgKernel.deserialize(bytes).sorted.map { case (i, c) => (i, c) })
  private val processedUdf =
    udf((bytes: Array[Byte]) => MgKernel.deserialize(bytes).processed)

  def hh_merge(a: Column, b: Column): Column = mergeUdf(a, b)
  /** Stored sketch → array<struct<_1 item,_2 est>> sorted (est desc, item asc). */
  def hh_items(sketch: Column): Column = itemsUdf(sketch)
  /** Total weight the sketch has seen (the N of the N/(k+1) bound). */
  def hh_processed(sketch: Column): Column = processedUdf(sketch)
}
