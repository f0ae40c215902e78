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
