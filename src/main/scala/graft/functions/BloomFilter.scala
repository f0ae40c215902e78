package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Bloom filter state: a plain long-word bit array + double hashing
  * (Kirsch–Mitzenmacher: index_i = h1 + i·h2). Deterministic — both
  * hashes are Spark's xxhash64 at fixed seeds — and merge is a bitwise
  * OR, which is order- and partitioning-independent, so a sketch built
  * from the same value set is BYTE-IDENTICAL however the data was
  * distributed. */
final class BloomState(val numBits: Int, val numHashes: Int) {
  require(numBits > 0 && numBits % 64 == 0, s"numBits $numBits not a multiple of 64")
  val words = new Array[Long](numBits / 64)

  @inline private def index(h1: Long, h2: Long, i: Int): Int = {
    // The step MUST be odd: numBits is a multiple of 64, so an h2 sharing
    // a large power-of-two factor with numBits walks a tiny coset —
    // observed in practice (two md5-hex fingerprints both drew h2 ≡ 0
    // mod 128 against numBits=640, probing the SAME 5 indices: a
    // structural false positive from one inserted element). An odd step
    // is coprime to the 2^k part, making the probe cycle ≥ numBits/5.
    val combined = h1 + i * (h2 | 1L)
    // floorMod keeps the index non-negative for negative hashes
    java.lang.Math.floorMod(combined, numBits.toLong).toInt
  }

  def put(h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val idx = index(h1, h2, i)
      words(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  def mightContain(h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val idx = index(h1, h2, i)
      if ((words(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def mergeFrom(other: BloomState): Unit = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"bloom merge shape mismatch: ($numBits,$numHashes) vs " +
        s"(${other.numBits},${other.numHashes})")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }
}

object BloomKernel {
  val Seed1 = 42L
  val Seed2 = 977L

  /** Format tag leading every serialized sketch: 8 bits of magic + a
    * format version, chosen NEGATIVE so it can never collide with the
    * first field of the tagless round-1 layout (numBits, a positive
    * multiple of 64) — legacy bytes are rejected with a typed error
    * instead of silently probing the wrong sequence (the unsafe
    * direction for dedup: false negatives admit duplicates
    * undetected). Bump the version whenever probe semantics or layout
    * change; readers reject rather than translate, because a sketch is
    * cheap to rebuild from data and a translated bit array CANNOT be —
    * the bits already encode the old probe sequence. */
  val FormatTag: Int = 0xB100F000 | 2 // version 2: odd-step probe + trailing content hash

  /** Standard sizing: m = -n ln p / (ln 2)², rounded up to whole words.
    * The overflow clamp stays word-aligned (largest multiple of 64
    * ≤ Int.MaxValue) so BloomState's numBits invariant holds even when
    * the clamp engages (expectedItems ≳ 2.2e8 at fpp 0.01). */
  def optimalNumBits(expectedItems: Long, fpp: Double): Int = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val m = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2)))
    (((m.toLong + 63) / 64) * 64).min(((Int.MaxValue.toLong - 63) / 64) * 64).toInt
  }

  def optimalNumHashes(expectedItems: Long, numBits: Int): Int =
    math.max(1, math.round(numBits.toDouble / expectedItems * math.log(2)).toInt)

  def hash1(v: Any, dt: DataType): Long = XxHash64Function.hash(v, dt, Seed1)
  def hash2(v: Any, dt: DataType): Long = XxHash64Function.hash(v, dt, Seed2)

  /** Serialized layout: [[FormatTag]], numBits, numHashes, words…,
    * contentHash. The trailing 8-byte content hash lets per-row
    * consumers ([[BloomMightContainShard]]'s cache) detect in O(1) that
    * a shard's sketch CHANGED (a new generation of the same shard id)
    * without comparing or re-hashing the whole bit array per row.
    * Purely a function of the words, so serialization stays
    * deterministic. */
  def serialize(state: BloomState): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + 8 + 8 * state.words.length + 8)
    buf.putInt(FormatTag)
    buf.putInt(state.numBits)
    buf.putInt(state.numHashes)
    state.words.foreach(buf.putLong)
    buf.putLong(contentHash(state.words))
    buf.array()
  }

  def contentHash(words: Array[Long]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < words.length) { h = h * 31 + words(i); i += 1 }
    h
  }

  private def checkTag(bytes: Array[Byte]): Unit = {
    require(bytes.length >= 4 + 8 + 8,
      s"Bloom sketch bytes too short (${bytes.length})")
    val tag = java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt
    require(tag == FormatTag,
      if (tag > 0)
        "legacy (untagged) Bloom sketch bytes: rebuilt sketches are " +
          "required — the stored bit array encodes an older probe " +
          "sequence and would yield silent false negatives"
      else
        f"Bloom sketch format mismatch: stored 0x$tag%08x, this build " +
          f"reads 0x$FormatTag%08x — rebuild the sketch")
  }

  /** Reads the trailing content hash without deserializing (tag still
    * verified — on legacy bytes the last word is bit-array data, not a
    * hash, and must not silently key a cache). */
  def storedContentHash(bytes: Array[Byte]): Long = {
    checkTag(bytes)
    java.nio.ByteBuffer.wrap(bytes, bytes.length - 8, 8).getLong
  }

  def deserialize(bytes: Array[Byte]): BloomState = {
    checkTag(bytes)
    val buf = java.nio.ByteBuffer.wrap(bytes, 4, bytes.length - 4)
    val state = new BloomState(buf.getInt, buf.getInt)
    var i = 0
    while (i < state.words.length) { state.words(i) = buf.getLong; i += 1 }
    state
  }

  def merged(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = deserialize(a)
    sa.mergeFrom(deserialize(b))
    serialize(sa)
  }
}

/** Mergeable Bloom sketch aggregate — the INCREMENTAL-dedup primitive a
  * 100 TB corpus needs: build the membership sketch of the existing
  * corpus once (per shard/day, OR-merged — each partial is just the m-bit
  * array), persist the bytes, then admit each incoming batch with ONE
  * scan-side [[BloomMightContain]] filter instead of an anti-join against
  * the full corpus. No false negatives (a known fingerprint is always
  * caught), false-positive rate ≤ fpp at the sized capacity — i.e. at
  * most ~fpp of genuinely-new docs are needlessly dropped, the safe
  * failure direction for dedup. At extreme corpus sizes the same
  * construction shards by fingerprint prefix (one sketch per shard)
  * rather than growing m unboundedly. */
case class BloomSketchBytes(
    child: Expression,
    expectedItems: Long,
    fpp: Double = 0.01,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomState] {

  private val numBits = BloomKernel.optimalNumBits(expectedItems, fpp)
  private val numHashes = BloomKernel.optimalNumHashes(expectedItems, numBits)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomState =
    new BloomState(numBits, numHashes)

  override def update(state: BloomState, input: InternalRow): BloomState = {
    val v = child.eval(input)
    if (v != null) {
      state.put(BloomKernel.hash1(v, child.dataType),
        BloomKernel.hash2(v, child.dataType))
    }
    state
  }

  override def merge(state: BloomState, other: BloomState): BloomState = {
    state.mergeFrom(other); state
  }

  override def eval(state: BloomState): Any = BloomKernel.serialize(state)

  override def serialize(state: BloomState): Array[Byte] =
    BloomKernel.serialize(state)
  override def deserialize(bytes: Array[Byte]): BloomState =
    BloomKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketchBytes =
    copy(child = newChildren.head)
}

/** Scan-side membership test against a STORED sketch. The sketch
  * argument must be foldable (a literal — the bytes collected once,
  * driver-side, like the IVF centroids), so the filter deserializes
  * exactly once per task instead of once per row, and the row-side work
  * is two xxhash64 calls + numHashes bit probes inside whole-stage
  * codegen. */
case class BloomMightContain(sketch: Expression, child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!sketch.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain needs a foldable (literal) sketch argument")
    else if (sketch.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sketch must be BINARY, got ${sketch.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val filter: BloomState =
    BloomKernel.deserialize(sketch.eval(null).asInstanceOf[Array[Byte]])

  def mightContainValue(v: Any): Boolean =
    filter.mightContain(BloomKernel.hash1(v, child.dataType),
      BloomKernel.hash2(v, child.dataType))

  override def nullSafeEval(v: Any): Any = mightContainValue(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship `this` once per task; the lazy filter deserializes on first use
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContainValue($v)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)
}

/** Scan-side membership test against a BROADCAST sketch — the at-scale
  * form of [[BloomMightContain]]. A literal sketch travels inside the
  * serialized plan of EVERY task; at 1% FPP the sketch is ~1.2
  * bytes/element (m = -n·ln p/ln²2 bits), i.e. ~1.2 GB for a 10⁹-doc
  * corpus — a driver/plan-size killer. A `Broadcast[Array[Byte]]`
  * instead serializes as a tiny handle; executors torrent-fetch the
  * blocks once per EXECUTOR (not per task) and the expression
  * deserializes the bit array lazily once per JVM reference. Same
  * kernel, byte-identical semantics to the literal form (spec-pinned).
  *
  * Sizing guidance at 100 TB: don't grow one sketch unboundedly — shard
  * by fingerprint prefix (one sketch per shard, OR-merged per shard),
  * keeping each broadcast in the low hundreds of MB. */
case class BloomMightContainBroadcast(
    bcast: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val filter: BloomState =
    BloomKernel.deserialize(bcast.value)

  def mightContainValue(v: Any): Boolean =
    filter.mightContain(BloomKernel.hash1(v, child.dataType),
      BloomKernel.hash2(v, child.dataType))

  override def nullSafeEval(v: Any): Any = mightContainValue(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // `this` is shipped once per task holding only the broadcast HANDLE;
    // the bit array itself arrives via the broadcast manager per executor
    val ref = ctx.addReferenceObj("bloomBcExpr", this,
      classOf[BloomMightContainBroadcast].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContainValue($v)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainBroadcast = copy(child = newChild)
}

/** Membership test for the SHARDED sketch construction: the corpus is
  * split by fingerprint hash into S shards, each with its own (much
  * smaller, independently refreshable) sketch, and incoming rows join
  * their shard's sketch as a per-row COLUMN. No single byte array then
  * needs to approach JVM limits at 10¹⁰+ elements, shards rebuild
  * incrementally (OR-merge per shard), and the join can be broadcast
  * (S rows) or shuffled on the shard key.
  *
  * A per-row column can't be deserialized per row (MB-scale sketches);
  * instead the expression caches deserialized shards in a per-task map
  * keyed by the shard id — one deserialization per shard per task, at
  * most S live states (≈ the whole-corpus sketch bytes, same as the
  * broadcast form's worst case; after a shard-keyed shuffle each task
  * touches ~S/P shards). Cache entries carry the sketch's trailing
  * CONTENT HASH (see BloomKernel.serialize), checked per row in O(1):
  * if a query carries two generations of the same shard id (appended
  * per-ingest sketch tables, old∪new unions), the changed bytes
  * re-deserialize instead of silently testing against the stale
  * generation. Sketches must come from [[BloomSketchBytes]] /
  * BloomKernel.serialize (the hash is part of the format). */
case class BloomMightContainShard(
    shard: Expression, sketch: Expression, child: Expression)
    extends TernaryExpression {

  override def first: Expression = shard
  override def second: Expression = sketch
  override def third: Expression = child

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (sketch.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sketch must be BINARY, got ${sketch.dataType.sql}")
    else if (!Seq[DataType](org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(shard.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shard id must be integral, got ${shard.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean =
    shard.nullable || sketch.nullable || child.nullable

  private final class Entry(val hash: Long, val state: BloomState)

  @transient private lazy val cache =
    new java.util.HashMap[Long, Entry]()

  def mightContainValue(shardId: Long, bytes: Array[Byte], v: Any): Boolean = {
    val hash = BloomKernel.storedContentHash(bytes)
    var entry = cache.get(shardId)
    if (entry == null || entry.hash != hash) {
      entry = new Entry(hash, BloomKernel.deserialize(bytes))
      cache.put(shardId, entry)
    }
    entry.state.mightContain(BloomKernel.hash1(v, child.dataType),
      BloomKernel.hash2(v, child.dataType))
  }

  override def nullSafeEval(shardId: Any, bytes: Any, v: Any): Any =
    mightContainValue(shardId.asInstanceOf[Number].longValue,
      bytes.asInstanceOf[Array[Byte]], v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomShardExpr", this,
      classOf[BloomMightContainShard].getName)
    nullSafeCodeGen(ctx, ev, (s, b, v) =>
      s"${ev.value} = $ref.mightContainValue((long) $s, $b, $v);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : BloomMightContainShard =
    copy(shard = newFirst, sketch = newSecond, child = newThird)
}

/** Membership probe of a FIXED value against a per-row sketch column —
  * the data-skipping shape: the planner asks, for every file's stored
  * bloom bytes, "might this file contain the predicate's literal?".
  * The mirror image of [[BloomMightContain]] (fixed sketch, per-row
  * value): here the VALUE is foldable, so its two xxhash64 probes are
  * computed once per task, and the per-row work is one deserialize +
  * numHashes bit tests. Rows are per-FILE metadata (one per declared
  * column per data file), so the per-row deserialize is metadata-scale
  * by construction — never a per-data-row cost. */
case class BloomProbe(sketch: Expression, probe: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = sketch
  override def right: Expression = probe

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (sketch.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sketch must be BINARY, got ${sketch.dataType.sql}")
    else if (!probe.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bloom_probe needs a foldable (literal) probe value")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = sketch.nullable || probe.nullable

  @transient private lazy val hashes: (Long, Long) = {
    val v = probe.eval(null)
    (BloomKernel.hash1(v, probe.dataType), BloomKernel.hash2(v, probe.dataType))
  }

  def mightContainIn(bytes: Array[Byte]): Boolean =
    BloomKernel.deserialize(bytes).mightContain(hashes._1, hashes._2)

  override def nullSafeEval(bytes: Any, v: Any): Any =
    mightContainIn(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbeExpr", this,
      classOf[BloomProbe].getName)
    defineCodeGen(ctx, ev, (b, _) => s"$ref.mightContainIn($b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(sketch = newLeft, probe = newRight)
}

/** "Does this per-row sketch contain ANY of a fixed value set?" — the
  * MERGE-discovery shape: per candidate FILE, does its bloom sketch
  * contain any of the delta's key values? The hash pairs arrive
  * PRE-COMPUTED, interleaved (h1,h2,h1,h2,…), through a BROADCAST (a
  * million-key delta is ~16 MB — plan-literal poison, one
  * executor-side fetch as a broadcast). Per row: one deserialize, then
  * probes with early exit on the first hit — a file containing any key
  * answers in O(1) expected probes. */
case class BloomContainsAny(bcast: Broadcast[Array[Long]],
    sketch: Expression) extends UnaryExpression {

  override def child: Expression = sketch
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = sketch.nullable

  def anyIn(bytes: Array[Byte]): Boolean = {
    val st = BloomKernel.deserialize(bytes)
    val hs = bcast.value
    var i = 0
    while (i < hs.length) {
      if (st.mightContain(hs(i), hs(i + 1))) return true
      i += 2
    }
    false
  }

  override def nullSafeEval(bytes: Any): Any =
    anyIn(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomAnyExpr", this,
      classOf[BloomContainsAny].getName)
    defineCodeGen(ctx, ev, b => s"$ref.anyIn($b)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomContainsAny = copy(sketch = newChild)
}

object BloomFunctions {
  def bloom_sketch(col: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    ColumnBridge.column(
      BloomSketchBytes(ColumnBridge.expression(col), expectedItems, fpp)
        .toAggregateExpression())

  /** `sketch` must be a literal (e.g. `lit(bytes)` of a collected
    * sketch); see [[BloomMightContain]]. Fine for small sketches and SQL;
    * for corpus-scale sketches use [[bloom_might_contain_bc]]. */
  def bloom_might_contain(sketch: Column, col: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(sketch), ColumnBridge.expression(col)))

  /** Probe a LITERAL value against a per-row sketch column; see
    * [[BloomProbe]] (the file-skipping direction). */
  def bloom_probe(sketch: Column, value: Column): Column =
    ColumnBridge.column(BloomProbe(
      ColumnBridge.expression(sketch), ColumnBridge.expression(value)))

  /** Broadcast-backed membership test — the production form: the sketch
    * bytes never enter the plan, only a broadcast handle does. See
    * [[BloomMightContainBroadcast]] for the sizing rationale. */
  def bloom_might_contain_bc(sketch: Broadcast[Array[Byte]], col: Column): Column =
    ColumnBridge.column(BloomMightContainBroadcast(
      sketch, ColumnBridge.expression(col)))

  /** Sharded membership test: `sketch` is a per-row column (each row
    * joined with its shard's sketch); see [[BloomMightContainShard]]. */
  def bloom_might_contain_shard(shard: Column, sketch: Column,
      col: Column): Column =
    ColumnBridge.column(BloomMightContainShard(
      ColumnBridge.expression(shard), ColumnBridge.expression(sketch),
      ColumnBridge.expression(col)))

  private val mergeUdf = org.apache.spark.sql.functions.udf(
    (a: Array[Byte], b: Array[Byte]) => BloomKernel.merged(a, b))
  /** OR two stored sketches of identical shape (runs once per group). */
  def bloom_merge(a: Column, b: Column): Column = mergeUdf(a, b)
}
