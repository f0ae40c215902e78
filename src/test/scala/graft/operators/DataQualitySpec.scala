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
}
