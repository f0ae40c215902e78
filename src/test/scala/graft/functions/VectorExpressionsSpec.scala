package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFunctions.{vec_cosine, vec_dot}

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vec_dot: float and double arrays, both eval paths") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
    ).toDF("f", "d")
    // codegen path
    val gen = df.select(vec_dot($"f", $"d")).head().getDouble(0)
    assert(gen == 32.0)
    // interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(vec_dot($"f", $"d")).head().getDouble(0)
      assert(interp == 32.0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("vec_dot is the sequential double fold (bit-exact vs manual)") {
    import spark.implicits._
    val a = Array.tabulate(64)(i => (math.sin(i) * 0.37).toFloat)
    val b = Array.tabulate(64)(i => (math.cos(i) * 1.13).toFloat)
    var expected = 0.0
    for (i <- 0 until 64) expected += a(i).toDouble * b(i).toDouble
    val got = Seq((a, b)).toDF("a", "b")
      .select(vec_dot($"a", $"b")).head().getDouble(0)
    assert(got == expected) // exact, not approximate
  }

  test("vec_dot null propagation") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(vec_dot($"a", $"b")).head().isNullAt(0))
  }

  test("vec_cosine on unit vectors") {
    import spark.implicits._
    val got = Seq((Array(0.6f, 0.8f), Array(0.6f, 0.8f)))
      .toDF("a", "b").select(vec_cosine($"a", $"b")).head().getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("vec_dot rejects non-array inputs at analysis") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] {
      df.select(vec_dot($"a", $"b")).head()
    }
  }
}
