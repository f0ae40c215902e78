package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Physical-plan hygiene: the properties that make these plans survive a
  * 100× scale-up are asserted here so a refactor can't silently regress
  * them (filter pushdown, column pruning, broadcast joins for dims,
  * TakeOrderedAndProject for top-k, partial aggregation). */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString

  test("q2 filter+project: predicates pushed to parquet, columns pruned") {
    val plan = planOf("q2_filter_project")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate"), plan)
    // scan must not read the full 11-column lineitem schema
    assert(!plan.contains("l_returnflag"), plan)
    assert(!plan.contains("l_tax"), plan)
  }

  test("q3 dim joins are broadcast, not shuffled") {
    val plan = planOf("q3_region_revenue")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q9 global top-k plans TakeOrderedAndProject (no global sort)") {
    val plan = planOf("q9_top10_global")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("q1 aggregation is partial+final (map-side combine)") {
    val plan = planOf("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_"), plan)
  }

  test("q19 IN-subquery plans a broadcast semi join") {
    val plan = planOf("q19_in_subquery")
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("Broadcast"), plan)
  }

  test("simhash runs through the codegen'd SimHash64, not interpreted HOFs") {
    // probe the PRODUCTION operator (the gate entry is an envelope form
    // that deliberately runs the interpreted HOF twin for comparison)
    val plan = Dedup.ddSimhash(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("simhash64") || plan.contains("SimHash64"), plan)
    assert(!plan.contains("ArrayAggregate"), plan)
    assert(!plan.contains("aggregate("), plan)
  }

  test("simhash pair join evaluates simhash64 once per side") {
    // the inferred join-key not-null constraint used to re-evaluate
    // simhash64(text) in a Filter below the Project that computes it;
    // nullIntolerant + the explicit text-not-null pre-filter reduce it
    // to one eval per join side (2 total in the self-join plan)
    val plan = Dedup.ddSimhashPairs(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    val evals = "simhash64\\(".r.findAllIn(plan).size
    assert(evals <= 2, s"simhash64 evaluated $evals times in plan:\n$plan")
  }

  test("knn scores through the codegen'd VecDot, not interpreted HOFs") {
    val plan = planOf("ss_knn_brute")
    assert(plan.contains("vecdot") || plan.contains("VecDot"), plan)
    assert(!plan.contains("ArrayAggregate"), plan)
  }

  test("wordcount pure-DataFrame plan stays in whole-stage codegen") {
    // AQE wraps the plan lazily; disable it so codegen stages are visible
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.SparkEntry.queries("wordcount_dataframe")(spark, TestSpark.sf0001)
      val plan = df.queryExecution.executedPlan.toString
      // codegen'd stages render as "*(n)" markers in the plan string
      assert(plan.contains("*(1)"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
