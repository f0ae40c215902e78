package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WordCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kernel and DataFrame word count agree on sf0.001 documents") {
    val a = WordCount.viaMapReduce(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val b = WordCount.viaDataFrame(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
