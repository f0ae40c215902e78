package graft.plans

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Long): Timestamp = new Timestamp(m * 60000L)

  test("asof join picks the latest right row at or before left time") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts(1), 10.0), (1L, ts(5), 11.0), (1L, ts(9), 12.0),
      (2L, ts(4), 50.0)).toDF("id", "qt", "price")
    val trades = Seq(
      (1L, ts(0)),  // before any quote -> null
      (1L, ts(5)),  // equal time counts -> 11.0
      (1L, ts(7)),  // between -> 11.0
      (1L, ts(100)), // after all -> 12.0
      (2L, ts(4)),  // -> 50.0
      (3L, ts(9))).toDF("id", "tt") // key with no quotes -> null
    val out = AsofJoinApi.joinAsof(trades, quotes,
      Seq(trades("id")), Seq(quotes("id")), trades("tt"), quotes("qt"))
      .select(trades("id"), $"tt", $"price")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out == Set(
      (1L, ts(0), None), (1L, ts(5), Some(11.0)), (1L, ts(7), Some(11.0)),
      (1L, ts(100), Some(12.0)), (2L, ts(4), Some(50.0)), (3L, ts(9), None)))
  }

  test("tolerance drops matches staler than the bound") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts(1), 10.0), (1L, ts(5), 11.0),
      (2L, ts(4), 50.0)).toDF("id", "qt", "price")
    val trades = Seq(
      (1L, ts(6)),   // 1 min stale -> within 2-min tolerance
      (1L, ts(8)),   // 3 min stale -> dropped by tolerance
      (2L, ts(4)),   // exact time -> kept
      (3L, ts(9))).toDF("id", "tt")
    val out = AsofJoinApi.joinAsofTolerant(trades, quotes,
      Seq(trades("id")), Seq(quotes("id")), trades("tt"), quotes("qt"),
      java.time.Duration.ofMinutes(2))
      .select(trades("id"), $"tt", $"price")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out == Set(
      (1L, ts(6), Some(11.0)), (1L, ts(8), None),
      (2L, ts(4), Some(50.0)), (3L, ts(9), None)))
  }

  test("inner variant skips unmatched left rows") {
    import spark.implicits._
    val quotes = Seq((1L, ts(5), 11.0)).toDF("id", "qt", "price")
    val trades = Seq(
      (1L, ts(4)),  // before the only quote -> skipped
      (1L, ts(6)),  // matched
      (2L, ts(9))).toDF("id", "tt") // keyless -> skipped
    val out = AsofJoinApi.joinAsof(trades, quotes,
      Seq(trades("id")), Seq(quotes("id")), trades("tt"), quotes("qt"),
      inner = true)
      .select(trades("id"), $"tt", $"price")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, ts(6), 11.0)))
  }

  test("inner + tolerance compose") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts(1), 10.0), (1L, ts(5), 11.0)).toDF("id", "qt", "price")
    val trades = Seq(
      (1L, ts(6)), (1L, ts(20))).toDF("id", "tt")
    val out = AsofJoinApi.joinAsofTolerant(trades, quotes,
      Seq(trades("id")), Seq(quotes("id")), trades("tt"), quotes("qt"),
      java.time.Duration.ofMinutes(2), inner = true)
      .select(trades("id"), $"tt", $"price")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, ts(6), 11.0)))
  }

  test("native asof equals the window-sweep formulation on real data") {
    val sweep = graft.operators.Relational
      .q21AsofJoin(spark, TestSpark.sf0001)
      .orderBy("event_id").collect().toSeq
    val native = graft.operators.Relational
      .q29AsofNative(spark, TestSpark.sf0001)
      .orderBy("event_id").collect().toSeq
    assert(native == sweep)
  }

  test("physical plan is the custom exec with clustered+sorted children") {
    import spark.implicits._
    val l = Seq((1L, ts(1))).toDF("id", "t")
    val r = Seq((1L, ts(0), 1.0)).toDF("id", "t2", "v")
    val df = AsofJoinApi.joinAsof(l, r, Seq(l("id")), Seq(r("id")),
      l("t"), r("t2"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
  }

  private def planFailure(df: org.apache.spark.sql.DataFrame): String = {
    val e = intercept[Throwable] { df.queryExecution.executedPlan }
    // plan-time (driver-side) failure, possibly wrapped by the planner
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).find(m => m != null && m.contains("asof join"))
      .getOrElse(fail(s"expected an asof-join validation error, got $e"))
  }

  test("tolerance on a non-temporal time type is rejected at plan time") {
    import spark.implicits._
    val l = Seq((1L, "a")).toDF("id", "t")
    val r = Seq((1L, "b", 1.0)).toDF("id", "t2", "v")
    val msg = planFailure(AsofJoinApi.joinAsof(l, r, Seq(l("id")),
      Seq(r("id")), l("t"), r("t2"), tolerance = Some(5L)))
    assert(msg.contains("tolerance unsupported"), msg)
    // the same shape WITHOUT a tolerance is fine (string time, plain asof)
    val ok = AsofJoinApi.joinAsof(l, r, Seq(l("id")), Seq(r("id")),
      l("t"), r("t2")).collect()
    assert(ok.length == 1)
  }

  test("left/right time type mismatch is rejected at plan time") {
    import spark.implicits._
    val l = Seq((1L, ts(1))).toDF("id", "t")
    val r = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 1.0))
      .toDF("id", "t2", "v")
    val msg = planFailure(AsofJoinApi.joinAsof(l, r, Seq(l("id")),
      Seq(r("id")), l("t"), r("t2")))
    assert(msg.contains("time type mismatch"), msg)
  }

  test("key type mismatch and negative tolerance are rejected at plan time") {
    import spark.implicits._
    val l = Seq((1L, ts(1))).toDF("id", "t")
    val r = Seq(("x", ts(0), 1.0)).toDF("id", "t2", "v")
    val msg = planFailure(AsofJoinApi.joinAsof(l, r, Seq(l("id")),
      Seq(r("id")), l("t"), r("t2")))
    assert(msg.contains("key type mismatch"), msg)
    val r2 = Seq((1L, ts(0), 1.0)).toDF("id", "t2", "v")
    val msg2 = planFailure(AsofJoinApi.joinAsof(l, r2, Seq(l("id")),
      Seq(r2("id")), l("t"), r2("t2"), tolerance = Some(-1L)))
    assert(msg2.contains("negative tolerance"), msg2)
  }

  test("merge pass runs inside whole-stage codegen (and matches the fallback)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.operators.Relational.q29AsofNative(spark, TestSpark.sf0001)
      val plan = df.queryExecution.executedPlan.toString
      // the WSCG star marker on the AsofJoin row: the merge is IN a stage
      assert("\\*\\(\\d+\\) AsofJoin".r.findFirstIn(plan).isDefined, plan)
      val generated = org.apache.spark.sql.execution.debug
        .codegenString(df.queryExecution.executedPlan)
      assert(generated.contains("asofLastMatch"),
        "generated stage lacks the as-of merge loop")
      // codegen and iterator paths agree row-for-row
      val withCodegen = df.orderBy("event_id").collect().toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val fallback = graft.operators.Relational
        .q29AsofNative(spark, TestSpark.sf0001)
        .orderBy("event_id").collect().toSeq
      assert(withCodegen == fallback)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
