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
    // the intentional rows-only set: probabilistic/sketch operators
    assert(rowsOnly == Set("dd_minhash_lsh_full", "dd_simhash",
      "dd_simhash_pairs", "ss_ann_lsh", "ss_knn_ivf", "q27_approx_agg"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
