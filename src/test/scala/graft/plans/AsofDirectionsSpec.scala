package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsofDirectionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Long): Timestamp = new Timestamp(m * 60000L)

  private def quotes = {
    import spark.implicits._
    Seq((1L, ts(1), 10.0), (1L, ts(5), 11.0), (1L, ts(9), 12.0),
      (2L, ts(4), 50.0)).toDF("qid", "qt", "price")
  }

  test("forward asof picks the earliest right row at or after left time") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts(0)),   // -> 10.0 (first quote ahead)
      (1L, ts(5)),   // equal time counts -> 11.0
      (1L, ts(7)),   // -> 12.0
      (1L, ts(100)), // after all -> null
      (2L, ts(4)),   // -> 50.0
      (3L, ts(9))).toDF("id", "tt") // keyless -> null
    val q = quotes
    val out = AsofDirectionsApi.joinAsofForward(trades, q,
      Seq(trades("id")), Seq(q("qid")), trades("tt"), q("qt"))
      .select(trades("id"), $"tt", $"price")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out == Set(
      (1L, ts(0), Some(10.0)), (1L, ts(5), Some(11.0)),
      (1L, ts(7), Some(12.0)), (1L, ts(100), None),
      (2L, ts(4), Some(50.0)), (3L, ts(9), None)))
  }

  test("forward tolerance drops matches farther ahead than the bound") {
    import spark.implicits._
    val trades = Seq((1L, ts(0)), (1L, ts(7))).toDF("id", "tt")
    val q = quotes
    // 2 minutes in micros: ts(0)->quote at ts(1) ok; ts(7)->ts(9) ok;
    // 1 minute: ts(7)->ts(9) is 2m away -> dropped
    def run(tolMinutes: Long) = AsofDirectionsApi.joinAsofForward(
        trades, q, Seq(trades("id")), Seq(q("qid")), trades("tt"), q("qt"),
        tolerance = Some(tolMinutes * 60L * 1000000L))
      .select($"tt", $"price").collect()
      .map(r => (r.getTimestamp(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(run(2) == Set((ts(0), Some(10.0)), (ts(7), Some(12.0))))
    assert(run(1) == Set((ts(0), Some(10.0)), (ts(7), None)))
  }

  test("nearest picks the closer side; equidistant ties go backward") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts(2)),   // 1m to ts(1), 3m to ts(5) -> 10.0
      (1L, ts(4)),   // 3m back, 1m fwd -> 11.0
      (1L, ts(7)),   // 2m back to ts(5), 2m fwd to ts(9): TIE -> 11.0
      (1L, ts(0)),   // nothing behind -> 10.0 (forward only)
      (1L, ts(100)), // nothing ahead -> 12.0 (backward only)
      (3L, ts(5))).toDF("id", "tt") // keyless -> null
    val out = AsofDirectionsApi.joinAsofNearest(trades, quotes,
      Seq("id" -> "qid"), "tt", "qt")
      .select($"id", $"tt", $"price")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out == Set(
      (1L, ts(2), Some(10.0)), (1L, ts(4), Some(11.0)),
      (1L, ts(7), Some(11.0)), (1L, ts(0), Some(10.0)),
      (1L, ts(100), Some(12.0)), (3L, ts(5), None)))
  }

  test("nearest tolerance bounds both sides") {
    import spark.implicits._
    val trades = Seq((1L, ts(7))).toDF("id", "tt") // 2m to both neighbors
    def run(tolMinutes: Long) = AsofDirectionsApi.joinAsofNearest(
        trades, quotes, Seq("id" -> "qid"), "tt", "qt",
        tolerance = Some(tolMinutes * 60L * 1000000L))
      .select($"price").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSet
    assert(run(2) == Set(Some(11.0))) // tie inside bound -> backward
    assert(run(1) == Set(None))       // both neighbors outside bound
  }

  test("forward composition equals a window-sweep reference on real data") {
    import spark.implicits._
    val got = graft.operators.Relational.q40AsofForward(spark, TestSpark.sf0001)
      .select($"purchase_id", $"next_error_id")
      .as[(Long, Option[Long])].collect().toMap
    // reference: per purchase, min-ts error at-or-after, via a plain join
    val events = graft.Tables.events(spark, TestSpark.sf0001)
    val errs = events.filter($"event_type" === "error")
      .groupBy($"user_id".as("e_user"), $"ts".as("e_ts"))
      .agg(max($"event_id").as("err_id"))
    val facts = events.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val ref = facts.join(errs,
        facts("user_id") === errs("e_user") && $"e_ts" >= $"ts", "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"purchase_id").orderBy($"e_ts".asc_nulls_last)))
      .filter($"rk" === 1)
      .select($"purchase_id", $"err_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == ref && got.nonEmpty)
  }

  test("rejects colliding right column names in nearest") {
    import spark.implicits._
    val l = Seq((1L, ts(1))).toDF("id", "tt")
    val r = Seq((1L, ts(1), 1.0)).toDF("id", "qt", "price")
    intercept[IllegalArgumentException] {
      AsofDirectionsApi.joinAsofNearest(l, r, Seq("id" -> "id"), "tt", "qt")
    }
  }
}
