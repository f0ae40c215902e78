package graft.core

import scala.collection.mutable
import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** The reference's entire user surface is two callbacks
  * (/root/reference/README.md:35-50):
  *  - `map(input)` yielding 0..n (key, value) pairs
  *    (/root/reference/lib/map_reduce/mapper.rb:43-55);
  *  - an OPTIONAL binary, commutative/associative combiner
  *    `reduce(key, v1, v2)` (/root/reference/lib/map_reduce/reduceable.rb:17-36).
  *
  * `MapSpec` alone reproduces the no-combiner multiset path (duplicate
  * keys preserved, /root/reference/spec/map_reduce/mapper_spec.rb:112-124);
  * mixing in `ReduceSpec` enables map-side combine + final aggregation.
  */
trait MapSpec[In, K, V] extends Serializable {
  def map(in: In): IterableOnce[(K, V)]
}

trait ReduceSpec[K, V] extends Serializable {
  /** Must be associative + commutative: applied at spill, merge, and
    * multi-run re-reduce in any grouping (reference contract,
    * /root/reference/README.md:42-50); identical to Spark's
    * `reduceByKey`/`reduceGroups` contract. */
  def reduce(key: K, v1: V, v2: V): V
}

trait MapReduceSpec[In, K, V] extends MapSpec[In, K, V] with ReduceSpec[K, V]

object MapReduce {

  /** Matches InvalidChunkLimit (/root/reference/lib/map_reduce/mapper.rb:77,
    * /root/reference/lib/map_reduce/reducer.rb:72). Spark manages merge
    * fan-in itself; kept for API compatibility only. */
  def validateChunkLimit(chunkLimit: Int): Unit =
    require(chunkLimit >= 2, s"chunk limit must be >= 2 but was $chunkLimit")

  /** Idiomatic Dataset path: flatMap → (optional) partial+final aggregate.
    * Spark plans map-side combine automatically; no spill/merge machinery
    * of our own (SURVEY §7.1). Output is NOT globally sorted — call
    * `.orderBy` or use `shuffle` for the sorted-partition contract. */
  def run[In, K, V](input: Dataset[In], job: MapSpec[In, K, V])(
      implicit kvEnc: Encoder[(K, V)], kEnc: Encoder[K]): Dataset[(K, V)] = {
    val pairs = input.flatMap(job.map)(kvEnc)
    job match {
      case r: ReduceSpec[K @unchecked, V @unchecked] =>
        pairs
          .groupByKey(_._1)
          .reduceGroups((a: (K, V), b: (K, V)) => (a._1, r.reduce(a._1, a._2, b._2)))
          .map(_._2)(kvEnc)
      case _ => pairs
    }
  }

  /** Reference-parity shuffle (/root/reference/lib/map_reduce/mapper.rb:76-96):
    * the full map-stage pipeline — map-side combine, partition by
    * bit-exact SHA1(JSON(key)) mod N, sort by key within each partition —
    * expressed as ONE Spark shuffle:
    *
    *   partial combine (bounded hash, flush-on-limit ≈ memory_limit spill
    *   combine at mapper.rb:129) → repartitionAndSortWithinPartitions
    *   (Spark's UnsafeExternalSorter replaces the hand-built external
    *   sort + k-way heap merge, SURVEY §2.1 #4/#7/#8) → streaming
    *   adjacent-key fold over the key-sorted run (the reduceable.rb:17-36
    *   semantics) as the final reduce.
    *
    * Result partition i holds exactly the keys the reference would route
    * to partition file i, key-sorted — the sorted-emission contract of
    * /root/reference/spec/map_reduce/reducer_spec.rb:86-96.
    */
  def shuffle[In, K: ClassTag: Ordering, V: ClassTag](
      input: RDD[In],
      job: MapSpec[In, K, V],
      numPartitions: Int = 32,
      combinerMaxEntries: Int = 1 << 16): RDD[(K, V)] = {
    val pairs = input.flatMap(in => job.map(in).iterator)
    val reduceOpt: Option[(K, V, V) => V] = job match {
      case r: ReduceSpec[K @unchecked, V @unchecked] => Some(r.reduce)
      case _ => None
    }
    shufflePairs(pairs, numPartitions, reduceOpt, combinerMaxEntries)
  }

  def shufflePairs[K: ClassTag: Ordering, V: ClassTag](
      pairs: RDD[(K, V)],
      numPartitions: Int,
      reduceOpt: Option[(K, V, V) => V],
      combinerMaxEntries: Int = 1 << 16): RDD[(K, V)] = {
    val preCombined = reduceOpt match {
      case Some(f) => pairs.mapPartitions(partialCombine(_, f, combinerMaxEntries))
      case None    => pairs
    }
    val partitioner = new Sha1HashPartitioner.AsSparkPartitioner(numPartitions)
    val sorted = preCombined.repartitionAndSortWithinPartitions(partitioner)
    reduceOpt match {
      case Some(f) =>
        sorted.mapPartitions(foldSortedRun(_, f), preservesPartitioning = true)
      case None => sorted
    }
  }

  /** Map-side partial combine with a bounded hash map: the analogue of
    * combine-at-spill (/root/reference/lib/map_reduce/mapper.rb:129) —
    * when the map fills, flush it downstream (Spark's sorter absorbs the
    * duplicates; correctness needs only associativity, re-reduce happens
    * in `foldSortedRun`). O(limit) memory per task. */
  private def partialCombine[K, V](
      it: Iterator[(K, V)], f: (K, V, V) => V, limit: Int): Iterator[(K, V)] =
    new Iterator[(K, V)] {
      private val buf = mutable.LinkedHashMap.empty[K, V]
      private var flushing: Iterator[(K, V)] = Iterator.empty
      private def fill(): Unit = {
        while (flushing.isEmpty && it.hasNext) {
          while (it.hasNext && buf.size < limit) {
            val (k, v) = it.next()
            buf.get(k) match {
              case Some(prev) => buf.update(k, f(k, prev, v))
              case None       => buf.update(k, v)
            }
          }
          if (buf.size >= limit || !it.hasNext) {
            flushing = buf.toList.iterator
            buf.clear()
          }
        }
      }
      override def hasNext: Boolean = { fill(); flushing.hasNext }
      override def next(): (K, V) = { fill(); flushing.next() }
    }

  /** Streaming fold of a key-sorted run — lookahead-1, O(1) state — the
    * semantics of /root/reference/lib/map_reduce/reduceable.rb:17-36. */
  private[graft] def foldSortedRun[K, V](
      it: Iterator[(K, V)], f: (K, V, V) => V): Iterator[(K, V)] =
    new Iterator[(K, V)] {
      private var pending: Option[(K, V)] = if (it.hasNext) Some(it.next()) else None
      override def hasNext: Boolean = pending.isDefined
      override def next(): (K, V) = {
        var (k, acc) = pending.get
        pending = None
        var done = false
        while (!done && it.hasNext) {
          val (k2, v2) = it.next()
          if (k2 == k) acc = f(k, acc, v2)
          else { pending = Some((k2, v2)); done = true }
        }
        (k, acc)
      }
    }

  /** The reference's binary combiner as a DataFrame-side typed UDAF
    * (org.apache.spark.sql.expressions.Aggregator): `reduce`/`merge` are
    * both the user function — exactly the contract of
    * /root/reference/lib/map_reduce/reduceable.rb:17-36, which re-reduces
    * partial results in arbitrary grouping. Usable in `agg(...)` where a
    * whole-column aggregation is wanted instead of reduceGroups. */
  def aggregatorOf[V](f: (V, V) => V)(
      implicit vEnc: Encoder[V], optEnc: Encoder[Option[V]]):
      org.apache.spark.sql.expressions.Aggregator[V, Option[V], V] =
    new org.apache.spark.sql.expressions.Aggregator[V, Option[V], V] {
      override def zero: Option[V] = None
      override def reduce(b: Option[V], a: V): Option[V] =
        Some(b.fold(a)(prev => f(prev, a)))
      override def merge(b1: Option[V], b2: Option[V]): Option[V] =
        (b1, b2) match {
          case (Some(x), Some(y)) => Some(f(x, y))
          case _ => b1.orElse(b2)
        }
      override def finish(r: Option[V]): V =
        r.getOrElse(throw new NoSuchElementException("empty aggregation"))
      override def bufferEncoder: Encoder[Option[V]] = optEnc
      override def outputEncoder: Encoder[V] = vEnc
    }

  /** Reduce-stage entry (/root/reference/lib/map_reduce/reducer.rb:69-100):
    * merge many sorted (or unsorted) chunk sets and fold per key, emitting
    * key-sorted output. In Spark the multi-pass fd-bounded merge dance is
    * subsumed by one sort-shuffle. */
  def reduceSorted[K: ClassTag: Ordering, V: ClassTag](
      chunks: RDD[(K, V)],
      reduce: (K, V, V) => V,
      numPartitions: Int = 32): RDD[(K, V)] =
    shufflePairs(chunks, numPartitions, Some(reduce))

  /** Reference parity for the block-LESS `Reducer#reduce` → Enumerator
    * form (/root/reference/lib/map_reduce/reducer.rb:70): a lazy
    * driver-side pull stream of the reduced, key-sorted output. Spark's
    * `toLocalIterator` fetches ONE partition per job as the consumer
    * advances, so driver memory holds a single partition of results,
    * never the full set — the same incremental-consumption contract the
    * reference's Enumerator gives its caller (keys arrive sorted within
    * each partition, partitions in SHA1-partitioner order). */
  def reduceStream[K: ClassTag: Ordering, V: ClassTag](
      chunks: RDD[(K, V)],
      reduce: (K, V, V) => V,
      numPartitions: Int = 32): Iterator[(K, V)] =
    reduceSorted(chunks, reduce, numPartitions).toLocalIterator

  /** Convenience for building an RDD of inputs from a Dataset column. */
  def inputRdd[In](ds: Dataset[In]): RDD[In] = ds.rdd

  def sparkOf(ds: Dataset[_]): SparkSession = ds.sparkSession
}
