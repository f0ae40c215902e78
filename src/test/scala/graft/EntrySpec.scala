package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  test("driver entry smoke: flagship query returns rows") {
    val df = SparkEntry.entry(TestSpark.spark)
    assert(df.count() > 0)
  }

  test("every query name has either an oracle or a documented rows-only status") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    val rowsOnly = q -- o
    // round 4 closed the rows-only set: every hash-/sketch-dependent
    // query now ships a measured-accuracy ENVELOPE gate form (exact
    // columns the oracle recomputes + booleans asserting the measured
    // error sits inside the shipped bound) instead of no_oracle
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("bench headline and raw overrides stay consistent with the query map") {
    Bench.headline.foreach(n =>
      assert(SparkEntry.queries.contains(n), s"headline $n not in queries"))
    // a raw override must shadow a real gate entry of the same name —
    // the bench times the production form of exactly that operator
    assert(Bench.raw.keySet.subsetOf(Bench.headline.toSet),
      s"raw overrides outside headline: ${Bench.raw.keySet -- Bench.headline}")
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(v.trim.nonEmpty, s"empty oracle for $k")
    }
  }
}
