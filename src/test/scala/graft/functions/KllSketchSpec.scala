package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class KllSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact while everything fits one weight-1 level") {
    // fewer than capacity(0) values: no compaction has happened, the
    // quantile walk is over the raw values
    val vals = (1 to 99).map(_.toDouble)
    val df = vals.toDF("v")
    val got = df.agg(
      KllFunctions.kll_quantile($"v", 0.5).as("m"),
      KllFunctions.kll_quantile($"v", 0.25).as("q1")).head()
    assert(got.getDouble(0) == 50.0)
    assert(got.getDouble(1) == 25.0)
  }

  test("rank error stays inside the envelope on real data") {
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val price = $"l_extendedprice".cast("double")
    val row = li.agg(
      KllFunctions.kll_quantile(price, 0.5).as("kll"),
      expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.45)").as("lo"),
      expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.55)").as("hi")).head()
    val (kll, lo, hi) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(kll >= lo && kll <= hi, s"kll median $kll outside [$lo, $hi]")
  }

  test("mergeable: any partitioning stays inside the rank envelope") {
    // merge trees differ between layouts, so sketches may differ — but
    // every valid merge keeps the rank guarantee
    val li = Tables.lineitem(spark, TestSpark.sf001)
      .select($"l_extendedprice".cast("double").as("p"))
    val bounds = li.agg(
      expr("percentile(p, 0.45)"), expr("percentile(p, 0.55)")).head()
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    for (parts <- Seq(1, 16)) {
      val est = li.repartition(parts)
        .agg(KllFunctions.kll_quantile($"p", 0.5)).head().getDouble(0)
      assert(est >= lo && est <= hi, s"parts=$parts median $est outside [$lo, $hi]")
    }
  }

  test("rank error shrinks as k grows (50 → 200 → 800)") {
    val li = Tables.lineitem(spark, TestSpark.sf001)
    def band(tol: Double) = li.agg(
      expr(s"percentile(CAST(l_extendedprice AS DOUBLE), ${0.5 - tol})"),
      expr(s"percentile(CAST(l_extendedprice AS DOUBLE), ${0.5 + tol})")).head()
    for ((k, tol) <- Seq(50 -> 0.10, 200 -> 0.05, 800 -> 0.03)) {
      val est = li.agg(KllFunctions
        .kll_quantile($"l_extendedprice".cast("double"), 0.5, k))
        .head().getDouble(0)
      val b = band(tol)
      assert(est >= b.getDouble(0) && est <= b.getDouble(1),
        s"k=$k median $est outside ±$tol rank band [${b.getDouble(0)}, ${b.getDouble(1)}]")
    }
  }

  test("kForRankTolerance: requested tolerance is honored across eps tiers") {
    val li = Tables.lineitem(spark, TestSpark.sf001)
    def band(tol: Double) = li.agg(
      expr(s"percentile(CAST(l_extendedprice AS DOUBLE), ${0.5 - tol})"),
      expr(s"percentile(CAST(l_extendedprice AS DOUBLE), ${0.5 + tol})")).head()
    for (eps <- Seq(0.10, 0.05, 0.02)) {
      val est = li.agg(KllFunctions
        .kll_quantile_tol($"l_extendedprice".cast("double"), 0.5, eps))
        .head().getDouble(0)
      val b = band(eps)
      assert(est >= b.getDouble(0) && est <= b.getDouble(1),
        s"eps=$eps (k=${KllFunctions.kForRankTolerance(eps)}) median $est " +
          s"outside ±$eps rank band [${b.getDouble(0)}, ${b.getDouble(1)}]")
    }
    // sizing sanity: monotone in 1/eps, clamped at both ends
    assert(KllFunctions.kForRankTolerance(0.05) == 200)
    assert(KllFunctions.kForRankTolerance(0.9) == 12)
    assert(KllFunctions.kForRankTolerance(1e-6) == 65536)
  }

  test("grouped sketch runs as a partial+final aggregate") {
    val df = Tables.lineitem(spark, TestSpark.sf001)
      .groupBy($"l_returnflag")
      .agg(KllFunctions.kll_quantile($"l_extendedprice".cast("double"), 0.5).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan)
    assert(df.collect().length == 3)
  }

  test("stored sketches merge across jobs and answer quantiles") {
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val price = $"l_extendedprice".cast("double")
    val sk = li.agg(
      KllFunctions.kll_sketch(when($"l_shipdate" < "1995-01-01", price)).as("a"),
      KllFunctions.kll_sketch(when($"l_shipdate" >= "1995-01-01", price)).as("b"))
    val merged = sk.select(
      KllFunctions.kll_sketch_quantile(
        KllFunctions.kll_merge($"a", $"b"), lit(0.5)).as("m")).head().getDouble(0)
    val bounds = li.agg(
      expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.45)"),
      expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.55)")).head()
    assert(merged >= bounds.getDouble(0) && merged <= bounds.getDouble(1),
      s"merged-sketch median $merged outside rank envelope")
  }

  test("SQL registration: kll_quantile callable from SQL") {
    GraftFunctions.register(spark)
    Tables.lineitem(spark, TestSpark.sf001).createOrReplaceTempView("kll_li")
    val viaSql = spark.sql(
      "SELECT kll_quantile(CAST(l_extendedprice AS DOUBLE), 0.5) FROM kll_li")
      .head().getDouble(0)
    val viaApi = Tables.lineitem(spark, TestSpark.sf001)
      .agg(KllFunctions.kll_quantile($"l_extendedprice".cast("double"), 0.5))
      .head().getDouble(0)
    assert(viaSql == viaApi)
  }

  test("q34 gate envelope reports all quantiles in bounds") {
    val rows = graft.operators.Advanced
      .q34KllQuantile(spark, TestSpark.sf001).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      Seq("p25_ok", "median_ok", "p75_ok").foreach(c =>
        assert(r.getAs[Boolean](c), s"$c false: $r"))
    }
  }
}
