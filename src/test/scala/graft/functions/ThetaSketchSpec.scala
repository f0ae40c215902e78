package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact below k distincts") {
    val est = (1 to 100).map(i => i % 40).toDF("v")
      .agg(ThetaSketchFunctions.theta_distinct($"v").as("d"))
      .head().getLong(0)
    assert(est == 40L)
  }

  test("estimate lands within the k=256 error envelope on real data") {
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val exact = li.agg(countDistinct($"l_orderkey")).head().getLong(0)
    val est = li.agg(ThetaSketchFunctions.theta_distinct($"l_orderkey").as("d"))
      .head().getLong(0)
    val err = math.abs(est - exact).toDouble / exact
    // RSE ~ 1/sqrt(k-2) = 6.3%; allow 3 sigma
    assert(err < 0.19, s"estimate $est vs exact $exact (err $err)")
  }

  test("merge-invariant: same estimate under any partitioning") {
    val li = Tables.lineitem(spark, TestSpark.sf001).select($"l_orderkey")
    val one = li.repartition(1)
      .agg(ThetaSketchFunctions.theta_distinct($"l_orderkey")).head().getLong(0)
    val many = li.repartition(16)
      .agg(ThetaSketchFunctions.theta_distinct($"l_orderkey")).head().getLong(0)
    assert(one == many, s"partial/final merge changed the estimate: $one vs $many")
  }

  test("grouped sketch runs as a partial+final aggregate") {
    val df = Tables.lineitem(spark, TestSpark.sf001)
      .groupBy($"l_returnflag")
      .agg(ThetaSketchFunctions.theta_distinct($"l_orderkey").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan)
    assert(df.collect().length == 3)
  }

  test("sketch set expressions: union and intersection estimates") {
    // A = orderkeys of ship-early rows, B = of ship-late rows — stored
    // sketches combined AFTER aggregation, the cross-job use case
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val sk = li.agg(
      ThetaSketchFunctions.theta_sketch(
        when($"l_shipdate" < "1995-01-01", $"l_orderkey")).as("a"),
      ThetaSketchFunctions.theta_sketch(
        when($"l_shipdate" >= "1995-01-01", $"l_orderkey")).as("b"))
    val row = sk.select(
      ThetaSketchFunctions.theta_estimate($"a").as("ea"),
      ThetaSketchFunctions.theta_estimate($"b").as("eb"),
      ThetaSketchFunctions.theta_estimate(
        ThetaSketchFunctions.theta_union($"a", $"b")).as("eu"),
      ThetaSketchFunctions.theta_intersect_estimate($"a", $"b").as("ei"))
      .head()
    val exactA = li.filter($"l_shipdate" < "1995-01-01")
      .agg(countDistinct($"l_orderkey")).head().getLong(0)
    val exactB = li.filter($"l_shipdate" >= "1995-01-01")
      .agg(countDistinct($"l_orderkey")).head().getLong(0)
    val exactU = li.agg(countDistinct($"l_orderkey")).head().getLong(0)
    val exactI = exactA + exactB - exactU
    def within(est: Long, exact: Long, tol: Double): Unit =
      assert(math.abs(est - exact).toDouble / math.max(exact, 1) < tol,
        s"est $est vs exact $exact")
    within(row.getAs[Long]("ea"), exactA, 0.19)
    within(row.getAs[Long]("eb"), exactB, 0.19)
    within(row.getAs[Long]("eu"), exactU, 0.19)
    // intersection has higher variance (sampled at min theta)
    within(row.getAs[Long]("ei"), exactI, 0.35)
    // set difference completes the algebra: |A \ B| and |B \ A|
    val diffs = sk.select(
      ThetaSketchFunctions.theta_difference_estimate($"a", $"b").as("dab"),
      ThetaSketchFunctions.theta_difference_estimate($"b", $"a").as("dba"))
      .head()
    within(diffs.getAs[Long]("dab"), exactA - exactI, 0.35)
    within(diffs.getAs[Long]("dba"), exactB - exactI, 0.35)
    // algebra consistency: |A\B| + |A∩B| ≈ |A| on the same sketches
    within(diffs.getAs[Long]("dab") + row.getAs[Long]("ei"),
      exactA, 0.3)
  }

  test("theta_distinct is callable from SQL with explicit k") {
    GraftFunctions.register(spark)
    Tables.lineitem(spark, TestSpark.sf001).createOrReplaceTempView("li_theta")
    val est = spark.sql(
      "SELECT theta_distinct(l_orderkey, 512) AS d FROM li_theta")
      .head().getLong(0)
    val exact = spark.sql(
      "SELECT COUNT(DISTINCT l_orderkey) FROM li_theta").head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.14)
  }
}
