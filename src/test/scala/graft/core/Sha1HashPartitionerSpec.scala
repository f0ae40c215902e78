package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Parity vectors for the reference's partitioner
  * (/root/reference/spec/map_reduce/hash_partitioner_spec.rb:3-23).
  * Values pinned from SHA1 computed independently (python hashlib):
  *   sha1('"key"')[0,5]          = 49db9 → 0x49db9 % {4,8,16,32} = 1,1,9,25
  *   sha1('["foo",1.0]')[0,5]    = b52aa → 2,2,10,10
  *   sha1('{"some":"key"}')[0,5] = ae27f → 3,7,15,31
  *   sha1('"key1"')[0,5]         = 98cf9 → 1,1,9,25
  *   sha1('"key2"')[0,5]         = dcb3a → 2,2,10,26
  *   sha1('[1,2,3]')[0,5]        = 9ef50 → 0,0,0,16
  *   sha1('123')[0,5]            = 40bd0 → 0,0,0,16
  *   sha1('1.5')[0,5]            = aa8f2 → 2,2,2,18
  */
class Sha1HashPartitionerSpec extends AnyFunSuite {

  private val vectors: Seq[(Any, String, Seq[Int])] = Seq(
    ("key", """"key"""", Seq(1, 1, 9, 25)),
    (Seq("foo", 1.0), """["foo",1.0]""", Seq(2, 2, 10, 10)),
    (scala.collection.immutable.ListMap("some" -> "key"), """{"some":"key"}""", Seq(3, 7, 15, 31)),
    ("key1", """"key1"""", Seq(1, 1, 9, 25)),
    ("key2", """"key2"""", Seq(2, 2, 10, 26)),
    (Seq(1, 2, 3), """[1,2,3]""", Seq(0, 0, 0, 16)),
    (123L, """123""", Seq(0, 0, 0, 16)),
    (1.5, """1.5""", Seq(2, 2, 2, 18)),
  )
  private val ns = Seq(4, 8, 16, 32)

  test("RubyJson canonicalization matches Ruby JSON.generate") {
    for ((key, json, _) <- vectors) assert(RubyJson.generate(key) === json)
  }

  test("partition = int(sha1(json)[0,5], 16) % n, pinned vectors") {
    for ((key, _, expected) <- vectors; (n, e) <- ns.zip(expected)) {
      assert(Sha1HashPartitioner(n)(key) === e, s"key=$key n=$n")
    }
  }

  test("reference arithmetic spec: 'fffff' % 4 == 3, % 8 == 7") {
    // hash_partitioner_spec.rb pins the mod arithmetic on a mocked digest;
    // check our hex→int→mod path directly on the top-20-bit value.
    assert(0xfffff % 4 === 3)
    assert(0xfffff % 8 === 7)
  }

  test("spark Partitioner wrapper agrees with scala partitioner") {
    val p = new Sha1HashPartitioner.AsSparkPartitioner(32)
    for ((key, _, expected) <- vectors) assert(p.getPartition(key) === expected(3))
  }

  test("column expression agrees on JSON strings") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val jsons = vectors.map(_._2)
    val got = jsons.toDF("j")
      .select(Sha1HashPartitioner.partitionColForJson(col("j"), 32))
      .as[Int].collect().toSeq
    assert(got === vectors.map(_._3(3)))
  }
}
