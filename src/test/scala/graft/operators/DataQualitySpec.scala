package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import DataQuality._

class DataQualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // planted violations: one NULL key, one out-of-range, one bad status,
  // one bad priority, one duplicate id, one dangling FK
  private val fact = Seq(
    (Some(1L), Some(10.0), "F", "1-URGENT", 100L),
    (Some(2L), Some(20.0), "O", "2-HIGH", 101L),
    (None: Option[Long], Some(30.0), "F", "3-MEDIUM", 102L),  // null key
    (Some(3L), Some(-5.0), "O", "4-NOT SPECIFIED", 103L),     // range
    (Some(1L), Some(40.0), "X", "5-LOW", 104L),               // status
    (Some(2L), None: Option[Double], "F", "9-BOGUS", 105L),   // null price + priority
    (Some(1L), Some(50.0), "O", "1-URGENT", 100L),            // dup id
    (Some(99L), Some(60.0), "F", "2-HIGH", 106L),             // dangling FK
  ).toDF("fk", "price", "status", "prio", "id")
  private val dim = Seq(1L, 2L, 3L).toDF("k")

  private val checks = Seq(
    DqNotNull("fk"),
    DqInRange("price", 0.0, 100.0),
    DqAccepted("status", Seq("F", "O", "P")),
    DqMatches("prio", "^[1-5]-"),
    DqUnique(Seq("id")),
    DqRef("fk", dim, "k"),
  )

  test("every violation class is counted exactly once on planted data") {
    val got = audit(fact, checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got("not_null:fk") == ((1L, 8L, false)))
    // null price violates range too (nulls fail value constraints)
    assert(got("range:price") == ((2L, 8L, false)))
    assert(got("accepted:status") == ((1L, 8L, false)))
    assert(got("matches:prio") == ((1L, 8L, false)))
    assert(got("unique:id") == ((1L, 8L, false)))
    // the NULL fk does NOT count as a ref violation; the dangling 99 does
    assert(got("ref:fk->k") == ((1L, 8L, false)))
  }

  test("clean data passes every check") {
    val clean = Seq((1L, 10.0, "F", "1-URGENT", 1L), (2L, 20.0, "O", "5-LOW", 2L))
      .toDF("fk", "price", "status", "prio", "id")
    val got = audit(clean, checks).collect()
    assert(got.length == 6)
    assert(got.forall(r => r.getLong(1) == 0L && r.getBoolean(3)))
  }

  test("the audit is one pass: a single scan of the fact table in the plan") {
    val plan = audit(fact, checks).queryExecution.executedPlan.toString
    // the fact is an in-memory LocalRelation here; count scan operators
    // on the gate's real table instead
    val gatePlan = DataQuality.dqAudit(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    val orderScans = "orders\\.parquet".r.findAllIn(gatePlan).length
    assert(orderScans >= 1, s"expected an orders scan:\n$gatePlan")
    // one FileScan node over orders (count_distinct Expand still reads once)
    val fileScans = "Scan parquet".r.findAllIn(gatePlan).toSeq
      .length
    assert(fileScans == 2, // orders + the broadcast customer dim
      s"expected exactly 2 file scans (fact + dim), got $fileScans:\n$gatePlan")
    // dimension must ride a broadcast, not a shuffle join
    assert(gatePlan.contains("BroadcastHashJoin") || gatePlan.contains("BroadcastExchange"),
      s"dim join should broadcast:\n$gatePlan")
    assert(plan.nonEmpty)
  }

  test("duplicate check names are refused") {
    val e = intercept[IllegalArgumentException] {
      audit(fact, Seq(DqNotNull("fk"), DqNotNull("fk")))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("foreachBatch audit accumulates to the full-data report for decomposable checks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // row-decomposable checks only: not-null/range/accepted/regex/ref
    // sum across batches; uniqueness does NOT decompose (cross-batch
    // duplicates are invisible per batch) and is deliberately excluded
    val decomposable = checks.filterNot(_.isInstanceOf[DqUnique])
    val acc = scala.collection.mutable.Map[String, (Long, Long)]()
    val input = MemoryStream[(Option[Long], Option[Double], String, String, Long)](spark)
    val q = input.toDF().toDF("fk", "price", "status", "prio", "id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        audit(batch, decomposable).collect().foreach { r =>
          val (v, n) = acc.getOrElse(r.getString(0), (0L, 0L))
          acc(r.getString(0)) = (v + r.getLong(1), n + r.getLong(2))
        }
        ()
      }
      .start()
    val allRows = fact.collect().map(r => (
      if (r.isNullAt(0)) None else Some(r.getLong(0)),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      r.getString(2), r.getString(3), r.getLong(4))).toSeq
    try {
      allRows.grouped(3).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
    } finally q.stop()
    val full = audit(fact, decomposable).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(acc.toMap == full)
  }

  test("multiple refs keep their tag columns apart") {
    val dim2 = Seq(100L, 101L, 102L, 103L, 104L, 105L).toDF("id2")
    val got = audit(fact, Seq(DqRef("fk", dim, "k"), DqRef("id", dim2, "id2")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("ref:fk->k") == 1L)     // 99 dangling
    assert(got("ref:id->id2") == 1L)   // 106 dangling (100 dup counts once per row: both rows match)
  }

  test("driftReport: identical sides report dist 0; a planted shift crosses the threshold") {
    import org.apache.spark.sql.functions._
    val ref = (0L until 1000L).map(i => (i, (i % 100).toDouble, s"c${i % 4}"))
      .toDF("id", "x", "g")
    // identical distributions (different row subsets, same shape)
    val same = driftReport(ref, ref,
      Seq(NumDrift("x", 10, 0.0, 100.0), CatDrift("g")))
      .collect().map(r => r.getString(0) ->
        (r.getDecimal(3).longValueExact(), r.getBoolean(4))).toMap
    assert(same("num:x") == (0L, false) && same("cat:g") == (0L, false))
    // planted shift: half the mass of g moves to one category; x shifts
    // by +50 for a third of rows
    val cur = ref
      .withColumn("g", when($"id" % 2 === 0, lit("c0")).otherwise($"g"))
      .withColumn("x", when($"id" % 3 === 0, $"x" + 50.0).otherwise($"x"))
    val got = driftReport(cur, ref,
      Seq(NumDrift("x", 10, 0.0, 100.0), CatDrift("g")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDecimal(3).longValueExact(),
          r.getBoolean(4))).toMap
    assert(got("cat:g")._4 && got("num:x")._4, s"planted drift missed: $got")
    assert(got("cat:g")._1 == 1000L && got("cat:g")._2 == 1000L)
    // exact TV check for the categorical side: c1/c3 lose half their
    // 250-row mass on even ids (c0 gains 250, c2's evens were
    // already renamed... compute independently from the data)
    val exp = {
      val refCnt = (0L until 1000L).groupBy(i => s"c${i % 4}")
        .view.mapValues(_.size.toLong).toMap
      val curCnt = (0L until 1000L).groupBy(i =>
        if (i % 2 == 0) "c0" else s"c${i % 4}")
        .view.mapValues(_.size.toLong).toMap
      (refCnt.keySet ++ curCnt.keySet).toSeq.map(k =>
        math.abs(curCnt.getOrElse(k, 0L) * 1000L -
          refCnt.getOrElse(k, 0L) * 1000L)).sum
    }
    assert(got("cat:g")._3 == exp, "dist must be the exact TV cross-product")
    // NULLs get their own bucket and count as mass
    val withNull = ref.withColumn("x",
      when($"id" < 300L, lit(null).cast("double")).otherwise($"x"))
    val nd = driftReport(withNull, ref, Seq(NumDrift("x", 10, 0.0, 100.0)))
      .collect().head
    assert(nd.getBoolean(4), "300 nulls vs none must drift")
  }
}
