package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native binary-search rank bucket must be row-identical to the
  * when-chain it replaced — including ties on boundaries, duplicate
  * boundaries (each counts), NaN (bucket n: Spark comparisons order NaN
  * above every double, unlike raw IEEE), NULL (bucket 0 through the
  * coalesce in rankQuantize), and values off both ends. */
class RankBucketSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def chain(value: org.apache.spark.sql.Column,
      boundaries: Seq[Double]): org.apache.spark.sql.Column =
    boundaries.map(b => when(value >= b, 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0)).cast("long")

  test("binary search == comparison chain on doubles with ties, dups, NaN, NULL") {
    val bounds = Seq(-3.0, -3.0, 0.0, 1.5, 1.5, 1.5, 7.25, 100.0)
    val vals: Seq[java.lang.Double] =
      Seq(-10.0, -3.0, -2.9, 0.0, 1.4999, 1.5, 3.0, 7.25, 99.9, 100.0,
        1e18, Double.NaN, null).map(v =>
        if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Double]))
    val df = vals.toDF("v")
    val got = df.select(
      graft.operators.Layout.rankQuantize(col("v"), bounds).as("rb"),
      coalesce(chain(col("v"), bounds), lit(0L)).as("ch"))
    assert(got.filter(col("rb") =!= col("ch")).isEmpty,
      got.collect().mkString(", "))
  }

  test("binary search == comparison chain on a long column at 255 boundaries") {
    val bounds = (1 until 256).map(_.toDouble)
    val df = spark.range(0, 5000).select((col("id") % 300 - 20).as("v"))
    val got = df.select(
      graft.operators.Layout.rankQuantize(col("v"), bounds).as("rb"),
      chain(col("v"), bounds).as("ch"))
    assert(got.filter(col("rb") =!= col("ch")).isEmpty)
    // and the generated plan stays inside whole-stage codegen (the
    // executedPlan string marks codegen stages with "*(n)")
    assert(got.queryExecution.executedPlan.toString.contains("*(1)"))
  }

  test("multi-quantile extraction equals per-q extraction element-wise") {
    val vals = (0 until 5000).map(i => ((i * 131) % 997) * 0.25)
    val st = new KllState(200)
    vals.foreach(st.insert)
    val bytes = KllKernel.serialize(st)
    val qs = ((1 until 256).map(_.toDouble / 256) ++ Seq(0.5, 0.001, 0.999))
      .toArray
    val multi = KllKernel.quantiles(bytes, qs)
    qs.zip(multi).foreach { case (q, m) =>
      assert(m == KllKernel.quantile(bytes, q), s"q=$q")
    }
  }

  test("empty boundary list degrades to bucket 0") {
    val df = Seq(1.0, -5.0).toDF("v")
    assert(df.select(graft.operators.Layout.rankQuantize(col("v"), Nil))
      .as[Long].collect().toSeq == Seq(0L, 0L))
  }
}
