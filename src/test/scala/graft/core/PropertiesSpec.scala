package graft.core

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The ScalaCheck properties SURVEY §5 calls out — the contracts the
  * reference only implies:
  *  - combine-invariance under permutation/re-chunking (the
  *    associative+commutative `reduce` contract, README.md:42-50);
  *  - shuffle output key-sorted within partitions and routed by the SHA1
  *    partitioner (reducer_spec.rb:86-96 + hash_partitioner parity);
  *  - multiset preservation without a combiner (mapper_spec.rb:112-124);
  *  - RubyOrdering total-order laws over the dynamic key domain.
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }
  private lazy val spark = TestSpark.spark

  private val word: Gen[String] = Gen.choose(1, 6)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val pairs: Gen[List[(String, Long)]] =
    Gen.listOf(Gen.zip(word, Gen.choose(-100L, 100L)))

  test("reduce result is invariant under permutation and re-chunking") {
    check(Prop.forAll(pairs, Gen.choose(1L, Long.MaxValue)) { (ps, seed) =>
      val sc = spark.sparkContext
      val expected = ps.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
      val shuffled = new scala.util.Random(seed).shuffle(ps)
      val nParts = 1 + (seed % 7).toInt.abs
      val out = MapReduce.shufflePairs(
        sc.parallelize(shuffled, math.max(1, nParts)),
        numPartitions = 8,
        reduceOpt = Some((_: String, a: Long, b: Long) => a + b))
        .collect().toMap
      out == expected
    })
  }

  test("shuffle emits key-sorted partitions routed by the SHA1 partitioner") {
    check(Prop.forAll(pairs) { ps =>
      val sc = spark.sparkContext
      val n = 8
      val part = Sha1HashPartitioner(n)
      val perPartition = MapReduce.shufflePairs(
        sc.parallelize(ps, 4), numPartitions = n,
        reduceOpt = Some((_: String, a: Long, b: Long) => a + b))
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.toList)))
        .collect().toMap
      perPartition.forall { case (i, rows) =>
        val keys = rows.map(_._1)
        keys == keys.sorted &&
          keys.forall(k => part(k) == i)
      }
    })
  }

  test("no combiner => multiset preserved exactly") {
    check(Prop.forAll(pairs) { ps =>
      val sc = spark.sparkContext
      val out = MapReduce.shufflePairs[String, Long](
        sc.parallelize(ps, 3), numPartitions = 4, reduceOpt = None)
        .collect().toList
      out.groupBy(identity).view.mapValues(_.size).toMap ==
        ps.groupBy(identity).view.mapValues(_.size).toMap
    })
  }

  private val dynKey: Gen[Any] = {
    val scalar = Gen.oneOf(
      word.map(identity[Any]),
      Gen.choose(-1000L, 1000L).map(identity[Any]),
      Gen.choose(-10.0, 10.0).map(identity[Any]))
    Gen.oneOf(scalar,
      Gen.listOfN(2, scalar).map(_.toVector: Any),
      Gen.listOfN(3, Gen.choose(-20L, 20L)).map(_.toVector: Any))
  }

  test("RubyOrdering is a lawful total order on comparable key sets") {
    // within one "shape" (string | number | uniform array) ordering laws hold
    check(Prop.forAll(Gen.listOfN(3, Gen.choose(-1000L, 1000L))) { xs =>
      val Seq(a, b, c) = xs.map(x => Vector[Any]("k", x)): @unchecked
      val ord = RubyOrdering
      val antisym = math.signum(ord.compare(a, b)) == -math.signum(ord.compare(b, a))
      val trans = !(ord.compare(a, b) <= 0 && ord.compare(b, c) <= 0) ||
        ord.compare(a, c) <= 0
      antisym && trans && ord.compare(a, a) == 0
    })
  }

  test("RubyOrdering sorts numeric array elements semantically (1 < 2 < 11)") {
    val keys = Seq(Vector[Any]("key3", 11L), Vector[Any]("key3", 1L),
      Vector[Any]("key3", 2L))
    val sorted = keys.sorted(RubyOrdering)
    assert(sorted == Seq(Vector[Any]("key3", 1L), Vector[Any]("key3", 2L),
      Vector[Any]("key3", 11L)))
  }

  test("cross-type keys raise (ArgumentError parity)") {
    intercept[IllegalArgumentException] {
      RubyOrdering.compare("a", 1L)
    }
  }
}
