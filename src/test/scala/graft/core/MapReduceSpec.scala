package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Port of the reference mapper/reducer spec semantics
  * (/root/reference/spec/map_reduce/{mapper,reducer}_spec.rb) onto the
  * Spark-native kernel. */
class MapReduceKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = { val s = spark; s.sparkContext }

  private object CountJob extends MapReduceSpec[String, String, Long] {
    override def map(in: String): IterableOnce[(String, Long)] =
      in.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1L))
    override def reduce(k: String, a: Long, b: Long): Long = a + b
  }

  private object NoCombineJob extends MapSpec[String, String, Long] {
    override def map(in: String): IterableOnce[(String, Long)] =
      in.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1L))
  }

  test("Dataset run with combiner: word count (README.md:34-46)") {
    import spark.implicits._
    val input = Seq("my first document", "my second document").toDS()
    val got = MapReduce.run(input, CountJob).collect().toMap
    assert(got === Map("my" -> 2L, "first" -> 1L, "second" -> 1L, "document" -> 2L))
  }

  test("Dataset run without combiner preserves multiset (mapper_spec.rb:112-124)") {
    import spark.implicits._
    val input = Seq("key1 key2", "key1").toDS()
    val got = MapReduce.run(input, NoCombineJob).collect().toSeq
    assert(got.count(_ == ("key1", 1L)) === 2)
    assert(got.count(_ == ("key2", 1L)) === 1)
    assert(got.size === 3)
  }

  test("shuffle: key-sorted within partitions, SHA1 partition placement, combined") {
    val input = sc.parallelize(Seq("key1 key2 key3", "key1 key3", "key3"), 3)
    val result = MapReduce.shuffle(input, CountJob, numPartitions = 8)
    assert(result.getNumPartitions === 8)
    val perPartition = result
      .mapPartitionsWithIndex { case (p, it) => Iterator((p, it.toList)) }
      .collect().toMap
    val expectPart = Sha1HashPartitioner(8)
    for ((p, pairs) <- perPartition; (k, _) <- pairs)
      assert(expectPart(k) === p, s"key $k in wrong partition")
    for ((_, pairs) <- perPartition)
      assert(pairs.map(_._1) === pairs.map(_._1).sorted, "partition not key-sorted")
    val all = perPartition.values.flatten.toMap
    assert(all === Map("key1" -> 2L, "key2" -> 1L, "key3" -> 3L))
  }

  test("shuffle without combiner preserves duplicates in sorted order (reducer_spec.rb:37-62)") {
    val input = sc.parallelize(Seq("key1 key2", "key1"), 2)
    val result = MapReduce.shuffle(input, NoCombineJob, numPartitions = 4)
    val pairs = result.collect().toSeq
    assert(pairs.count(_ == ("key1", 1L)) === 2)
    assert(pairs.size === 3)
  }

  test("foldSortedRun folds adjacent equal keys with lookahead-1 (reduceable.rb:17-36)") {
    val in = Iterator(("a", 1), ("a", 2), ("b", 5), ("c", 1), ("c", 1))
    val out = MapReduce.foldSortedRun[String, Int](in, (_, x, y) => x + y).toList
    assert(out === List(("a", 3), ("b", 5), ("c", 2)))
  }

  test("chunk_limit < 2 raises (mapper.rb:77, reducer.rb:72)") {
    intercept[IllegalArgumentException](MapReduce.validateChunkLimit(1))
    MapReduce.validateChunkLimit(2)
  }

  test("reduceSorted emits globally key-sorted partitions (reducer_spec.rb:86-96)") {
    implicit val ord: Ordering[Any] = RubyOrdering
    val chunks = sc.parallelize(Seq[(Any, Any)](
      (Seq("key3", 11L), 1L), (Seq("key3", 1L), 1L), (Seq("key1", 1L), 1L),
      (Seq("key3", 3L), 1L), (Seq("key3", 2L), 1L), (Seq("key3", 1L), 1L)))
    val out = MapReduce
      .reduceSorted[Any, Any](chunks, (_, a, b) =>
        a.asInstanceOf[Long] + b.asInstanceOf[Long], numPartitions = 1)
      .collect().toSeq
    assert(out === Seq(
      (Seq("key1", 1L), 1L), (Seq("key3", 1L), 2L), (Seq("key3", 2L), 1L),
      (Seq("key3", 3L), 1L), (Seq("key3", 11L), 1L)))
  }

  test("reduceStream pulls reduced output lazily, one partition per job (reducer.rb:70)") {
    val sc = spark.sparkContext
    val acc = sc.longAccumulator("folds")
    val pairs = sc.parallelize((1 to 1000).map(i => (i % 100, 1L)), 8)
    val stream = MapReduce.reduceStream(pairs,
      (_: Int, a: Long, b: Long) => { acc.add(1); a + b }, numPartitions = 4)
    val first = stream.next() // forces the map stage + partition 0's fold only
    val foldsAfterFirst = acc.value
    val rest = stream.toSeq
    assert(acc.value > foldsAfterFirst,
      "remaining partitions folded eagerly — stream is not lazy")
    val all = (first +: rest).toMap
    assert(all == (0 until 100).map(k => k -> 10L).toMap)
  }

  test("aggregatorOf: binary reduce as a typed DataFrame-side UDAF") {
    import spark.implicits._
    val agg = MapReduce.aggregatorOf[Long](_ + _)
    val ds = Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("total"))
      .collect().toMap
    assert(out == Map("a" -> 3L, "b" -> 5L))
  }
}
