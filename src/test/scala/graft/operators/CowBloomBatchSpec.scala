package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Batched probe planning ([[CowTable.pruneReportBloomBatch]]): one
  * Spark job answers every probe's (bloom_kept, stats_kept, total)
  * triple, and each triple is IDENTICAL to the per-probe
  * [[CowTable.pruneReportBloom]] — the read path's own planning — so
  * the batch is pure instrumentation, never a second semantics. */
class CowBloomBatchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(): String = {
    val t = s"${System.getProperty("java.io.tmpdir")}/graft_bloom_batch/" +
      java.util.UUID.randomUUID().toString.take(8)
    // residue-class layout: every file spans ~the whole key range, so
    // minmax keeps ~all files and only blooms prune point lookups
    val df = spark.range(4000L)
      .select(($"id" * 2L).as("k2"), ($"id" % 8L).cast("int").as("f"),
        ($"id" * 1.5).as("x"))
    CowTable.init(df.repartition(8, $"f"), t)
    CowTable.declareBloom(spark, t,
      Map("k2" -> CowTable.BloomColSpec(fpp = 0.01, itemsPerFile = 1 << 14)))
    t
  }

  test("batch triples equal per-probe planning triples, one job each side") {
    val t = fixture()
    val probes = Seq(16L, 3998L, 3999L, 7998L, 123L, 4001L)
    val conds = probes.map(k => col("k2") === k)
    val batch = CowTable.pruneReportBloomBatch(spark, t, conds)
    val single = conds.map(c => CowTable.pruneReportBloom(spark, t, c))
    assert(batch == single,
      s"batch $batch vs per-probe $single")
    // sanity: an interior present key sits inside many files' [min,max]
    // (overlapping residue-class ranges) yet lives in ONE — the bloom
    // pass must prune strictly below minmax; absent odd keys prune hard
    val byProbe = probes.zip(batch).toMap
    assert(byProbe(16L)._2 > 1 && byProbe(16L)._1 < byProbe(16L)._2)
    assert(byProbe(3999L)._1 <= 1)
  }

  test("batch without a declared bloom degrades to stats counts") {
    val t = s"${System.getProperty("java.io.tmpdir")}/graft_bloom_batch/" +
      java.util.UUID.randomUUID().toString.take(8)
    CowTable.init(spark.range(100L).select($"id", ($"id" * 2).as("k2")), t)
    val r = CowTable.pruneReportBloomBatch(spark, t,
      Seq(col("k2") === 4L, col("k2") === 5L))
    val s1 = CowTable.pruneReportBloom(spark, t, col("k2") === 4L)
    val s2 = CowTable.pruneReportBloom(spark, t, col("k2") === 5L)
    assert(r == Seq(s1, s2))
  }

  test("empty probe list returns empty") {
    val t = fixture()
    assert(CowTable.pruneReportBloomBatch(spark, t, Nil).isEmpty)
  }
}
