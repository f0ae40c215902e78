package graft.plans

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The asof_join table-valued function: spark.sql reaching the native
  * as-of operator without the Scala DSL. */
class AsofSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Long): Timestamp = new Timestamp(m * 60000L)

  private def setup(): Unit = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, ts(1), 10.0), (1L, ts(5), 11.0), (2L, ts(4), 50.0))
      .toDF("id", "qt", "price").createOrReplaceTempView("sql_quotes")
    Seq((1L, ts(0)), (1L, ts(6)), (1L, ts(9)), (2L, ts(4)), (3L, ts(9)))
      .toDF("id", "tt").createOrReplaceTempView("sql_trades")
  }

  test("FROM asof_join(...) runs the native operator") {
    setup()
    val df = spark.sql(
      """SELECT tt, price FROM asof_join('sql_trades', 'sql_quotes',
        |  'l.id', 'r.id', 'l.tt', 'r.qt') WHERE l.id = 1""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("AsofJoin"))
    val out = df.collect().map(r => (r.getTimestamp(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(out == Set((ts(0), None), (ts(6), Some(11.0)), (ts(9), Some(11.0))))
  }

  test("tolerance and inner mode arguments") {
    setup()
    // 2-minute tolerance in micros; inner drops unmatched/stale rows
    val out = spark.sql(
      """SELECT l.id, tt, price FROM asof_join('sql_trades', 'sql_quotes',
        |  'l.id', 'r.id', 'l.tt', 'r.qt', 120000000, 'inner')""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .toSet
    assert(out == Set((1L, ts(6), 11.0), (2L, ts(4), 50.0)))
  }

  test("interval tolerance: INTERVAL literal and '2 minutes' string match micros") {
    setup()
    def run(tolSql: String): Set[(Long, Timestamp, Double)] = spark.sql(
      s"""SELECT l.id, tt, price FROM asof_join('sql_trades', 'sql_quotes',
         |  'l.id', 'r.id', 'l.tt', 'r.qt', $tolSql, 'inner')""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .toSet
    val viaMicros = run("120000000")
    assert(viaMicros == Set((1L, ts(6), 11.0), (2L, ts(4), 50.0)))
    assert(run("INTERVAL '2' MINUTE") == viaMicros)
    assert(run("'2 minutes'") == viaMicros)
  }

  test("interval tolerance rejects month intervals and raw-long time columns") {
    setup()
    import spark.implicits._
    val months = intercept[Exception] {
      spark.sql(
        """SELECT * FROM asof_join('sql_trades', 'sql_quotes',
          |  'l.id', 'r.id', 'l.tt', 'r.qt', '1 month')""".stripMargin).collect()
    }
    assert(months.getMessage.contains("not a fixed physical duration"), months)
    // raw bigint time column: integral tolerance fine, interval rejected
    Seq((1L, 10L), (1L, 50L)).toDF("id", "t")
      .createOrReplaceTempView("sql_raw_r")
    Seq((1L, 60L)).toDF("id", "t").createOrReplaceTempView("sql_raw_l")
    val rawOk = spark.sql(
      """SELECT r.t FROM asof_join('sql_raw_l', 'sql_raw_r',
        |  'l.id', 'r.id', 'l.t', 'r.t', 15)""".stripMargin).collect()
    assert(rawOk.map(_.getLong(0)).toSeq == Seq(50L))
    val rawInterval = intercept[Exception] {
      spark.sql(
        """SELECT * FROM asof_join('sql_raw_l', 'sql_raw_r',
          |  'l.id', 'r.id', 'l.t', 'r.t', '5 minutes')""".stripMargin).collect()
    }
    assert(rawInterval.getMessage.contains("no physical duration"), rawInterval)
  }

  test("computed time expressions parse (cast inside the argument string)") {
    setup()
    // identical result through a cast that round-trips the time column
    val direct = spark.sql(
      """SELECT l.id, tt, price FROM asof_join('sql_trades', 'sql_quotes',
        |  'l.id', 'r.id', 'l.tt', 'r.qt')""".stripMargin).collect().toSeq
    val cast = spark.sql(
      """SELECT l.id, tt, price FROM asof_join('sql_trades', 'sql_quotes',
        |  'l.id', 'r.id',
        |  'CAST(l.tt AS TIMESTAMP)', 'CAST(r.qt AS TIMESTAMP)')""".stripMargin)
      .collect().toSeq
    assert(direct.toSet == cast.toSet && direct.nonEmpty)
  }

  test("sql surface equals the Scala DSL on real data") {
    val sql = graft.operators.Relational
      .q36AsofSql(spark, TestSpark.sf0001)
      .orderBy("event_id").collect().toSeq
    val native = graft.operators.Relational
      .q29AsofNative(spark, TestSpark.sf0001)
      .orderBy("event_id").collect().toSeq
    assert(sql == native && sql.nonEmpty)
  }

  test("bad arguments fail with the usage message") {
    setup()
    val tooFew = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('sql_trades', 'sql_quotes')").collect()
    }
    assert(tooFew.getMessage.contains("expected 6-8 arguments"), tooFew)
    val notLit = intercept[Exception] {
      spark.sql(
        """SELECT * FROM asof_join('sql_trades', 'sql_quotes',
          |  'l.id', 'r.id', 'l.tt', 'r.qt', 5, 'sideways')""".stripMargin)
        .collect()
    }
    assert(notLit.getMessage.contains("mode must be"), notLit)
  }
}
