package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class ApproxAndBucketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approximate aggregates land within the sketch error envelope") {
    import spark.implicits._
    // raw estimates vs exact answers (the gate form reduces these to
    // envelope booleans; this pins the underlying sketch accuracy)
    val approx = Tables.lineitem(spark, TestSpark.sf001)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(1000))
          .cast("double").as("approx_median_price"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("approx_orders"), r.getAs[Double]("approx_median_price"))).toMap
    val exact = Tables.lineitem(spark, TestSpark.sf001)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("orders"),
        expr("percentile(l_extendedprice, 0.5)").as("median"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("orders"), r.getAs[Double]("median"))).toMap
    exact.foreach { case (flag, (orders, median)) =>
      val (aOrders, aMedian) = approx(flag)
      assert(math.abs(aOrders - orders).toDouble / orders < 0.05,
        s"$flag HLL error: $aOrders vs $orders")
      assert(math.abs(aMedian - median) / median < 0.05,
        s"$flag quantile-sketch error: $aMedian vs $median")
    }
  }

  test("q27/q33 gate envelopes report all measured errors in bounds") {
    Seq(Advanced.q27ApproxAgg(spark, TestSpark.sf001),
        Advanced.q33ThetaSketch(spark, TestSpark.sf001)).foreach { df =>
      val boolCols = df.schema.fields.filter(_.dataType ==
        org.apache.spark.sql.types.BooleanType).map(_.name)
      assert(boolCols.nonEmpty)
      df.collect().foreach { r =>
        boolCols.foreach(c => assert(r.getAs[Boolean](c), s"$c was false: $r"))
      }
    }
  }

  test("q4_bucketed joins with no shuffle under the join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Relational.q4Bucketed(spark, TestSpark.sf0001)
      val joins = df.queryExecution.executedPlan
        .collect { case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, df.queryExecution.executedPlan.toString)
      // bucketed layout satisfies the join's distribution requirement:
      // nothing between the scans and the join shuffles
      joins.foreach { j =>
        val shuffles = j.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty, j.toString)
      }
      // and the result matches the unbucketed query
      val bucketed = df.collect().map(_.toSeq).toSet
      val plain = Relational.q4FactJoin(spark, TestSpark.sf0001)
        .collect().map(_.toSeq).toSet
      assert(bucketed == plain)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("q35 second-hot-key bucketing joins with no shuffle under the join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Relational.q35BucketedCust(spark, TestSpark.sf0001)
      val joins = df.queryExecution.executedPlan
        .collect { case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, df.queryExecution.executedPlan.toString)
      joins.foreach { j =>
        val shuffles = j.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty, j.toString)
      }
      // and the result matches the unbucketed formulation
      val bucketed = df.collect().map(_.toSeq).toSet
      val cust = graft.Tables.customer(spark, TestSpark.sf0001)
      val ord = graft.Tables.orders(spark, TestSpark.sf0001)
      val plain = cust.join(ord, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
            .as("sum_price"))
        .collect().map(_.toSeq).toSet
      assert(bucketed == plain)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, TestSpark.sf0001)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, TestSpark.sf0001)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
