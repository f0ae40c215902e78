package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSpec extends AnyFunSuite {
  test("install wires SQL functions and the as-of strategy (idempotent)") {
    val spark = Graft.install(Graft.install(TestSpark.spark))
    assert(spark.sql("SELECT vec_dot(array(1.0D), array(2.0D)) AS d")
      .head().getDouble(0) == 2.0)
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.AsofJoinStrategy) == 1)
  }
}
