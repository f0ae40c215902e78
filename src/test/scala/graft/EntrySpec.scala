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
}
