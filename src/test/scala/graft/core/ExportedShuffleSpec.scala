package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExportedShuffleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sum: (Any, Any, Any) => Any =
    (_, a, b) => a.asInstanceOf[Long] + b.asInstanceOf[Long]

  test("two-job topology: mapper writes partition files, reducer merges them (README.md:52-118)") {
    val sc = spark.sparkContext
    val base = Files.createTempDirectory("graft-shuffle").toString
    val dir1 = s"$base/job1"; val dir2 = s"$base/job2"

    // two independent "mapper jobs" writing to the rendezvous store
    val pairs1 = sc.parallelize(Seq[(Any, Any)](("key1", 1L), ("key2", 1L), ("key3", 1L)))
    val pairs2 = sc.parallelize(Seq[(Any, Any)](("key1", 1L), ("key3", 1L)))
    ExportedShuffle.write(pairs1, dir1, numPartitions = 4, reduce = Some(sum))
    ExportedShuffle.write(pairs2, dir2, numPartitions = 4, reduce = Some(sum))

    // partition layout: file i holds exactly partition i's keys, JSON-lines
    val p8 = Sha1HashPartitioner(4)
    for (i <- 0 until 4) {
      val f = new java.io.File(s"$dir1/part-0000$i")
      assert(f.exists, s"missing partition file $i")
      val lines = scala.io.Source.fromFile(f).getLines().toList
      for (line <- lines) {
        val (k, _) = JsonLines.parsePair(line)
        assert(p8(k) === i)
      }
    }

    // "reducer job": union of both jobs' chunks, final reduce, sorted
    val out = ExportedShuffle
      .read(spark, Seq(dir1, dir2), numPartitions = 4, reduce = Some(sum))
      .collect().toMap
    assert(out === Map("key1" -> 2L, "key2" -> 1L, "key3" -> 2L))
  }

  test("round-trips array keys and JSON-object values through JSON-lines") {
    val sc = spark.sparkContext
    val dir = Files.createTempDirectory("graft-shuffle2").toString + "/out"
    val pairs = sc.parallelize(Seq[(Any, Any)](
      (Seq("key3", 11L), Map("value" -> 1L)),
      (Seq("key3", 2L), 1.5),
      (Seq("key1", 1L), null)))
    ExportedShuffle.write(pairs, dir, numPartitions = 2)
    val back = ExportedShuffle.read(spark, Seq(dir), numPartitions = 2).collect().toSeq
    assert(back.toSet === Set[(Any, Any)](
      (Vector("key3", 11L), Map("value" -> 1L)),
      (Vector("key3", 2L), 1.5),
      (Vector("key1", 1L), null)))
  }

  test("mixed incomparable key types raise, as in Ruby (priority_queue.rb:15-21)") {
    val sc = spark.sparkContext
    val dir = Files.createTempDirectory("graft-shuffle3").toString + "/out"
    val pairs = sc.parallelize(Seq[(Any, Any)]((Seq("a"), 1L), (123L, 1L), ("s", 1L)))
    val e = intercept[org.apache.spark.SparkException](
      ExportedShuffle.write(pairs, dir, numPartitions = 2))
    assert(e.getMessage.contains("comparison of") ||
      Option(e.getCause).exists(_.getMessage.contains("comparison of")))
  }
}
