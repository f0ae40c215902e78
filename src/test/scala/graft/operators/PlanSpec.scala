package graft.operators

import org.apache.spark.sql.functions._
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

  test("q37 RANGE frame: peers at one instant share the frame; interval bounds hold") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import java.sql.Timestamp
    def ts(h: Long) = new Timestamp(h * 3600_000L)
    // user 1: events at 0h, 5h, 5h (tie), 12h — the 6h trailing frame at
    // 5h includes 0h and BOTH 5h peers; at 12h it includes only itself
    val ev = Seq((1L, 10L, ts(0), 1.0), (1L, 11L, ts(5), 2.0),
      (1L, 12L, ts(5), 4.0), (1L, 13L, ts(12), 8.0))
      .toDF("user_id", "event_id", "ts", "value")
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-6L * 3600 * 1000000, Window.currentRow)
    val out = ev.withColumn("ts_us", unix_micros($"ts"))
      .select($"event_id", count(lit(1)).over(w).as("n"),
        sum($"value").over(w).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(10L) == ((1L, 1.0)))
    assert(out(11L) == ((3L, 7.0))) // tie peer included despite later event_id
    assert(out(12L) == ((3L, 7.0))) // identical frame for the peer
    assert(out(13L) == ((1L, 8.0))) // 5h is 7h earlier — outside the frame
  }

  test("q38 full outer keeps both unmatched directions") {
    val rows = Relational.q38FullOuter(spark, TestSpark.sf0001).collect()
    assert(rows.exists(r => r.isNullAt(2))) // customer with no orders
    assert(rows.exists(r => r.isNullAt(1))) // order block with filtered customer
    assert(rows.forall(!_.isNullAt(0))) // coalesced key never null
  }

  test("q39 unpivot melts each row into exactly four measures") {
    import spark.implicits._
    val out = Relational.q39Unpivot(spark, TestSpark.sf0001)
    val base = graft.Tables.lineitem(spark, TestSpark.sf0001)
      .filter($"l_orderkey" < 100).count()
    assert(out.count() == 4 * base)
    assert(out.select($"measure").distinct().as[String].collect().sorted
      .toSeq == Seq("discount", "extendedprice", "quantity", "tax"))
  }

  test("ta_char_terms ranks rare-but-frequent tokens first, prunes map-side") {
    val gate = TextAnalysis.taCharTerms(spark, TestSpark.sf0001)
    val plan = gate.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    val rows = gate.collect()
    // exactly ≤ k rows per doc, rk contiguous from 1
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= TextAnalysis.CharTermsK)
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length))
    }
    // score really is tf/df for every emitted row
    rows.foreach { r =>
      assert(r.getAs[Double]("score") ==
        r.getAs[Long]("tf").toDouble / r.getAs[Long]("df"))
    }
  }

  test("nested struct columns: schema pruning and predicate pushdown reach the scan") {
    import spark.implicits._
    // materialize a nested table (struct + array<struct>) — the shape a
    // multimodal/metadata-rich 100 TB table actually has; reading one
    // leaf must not drag the whole struct through the scan
    val dir = java.nio.file.Files.createTempDirectory("nested").toString
    graft.Tables.events(spark, TestSpark.sf0001)
      .select($"event_id",
        struct($"ts", $"value", $"event_type").as("payload"),
        array(struct($"user_id".as("uid"), $"value".as("score")))
          .as("tags"))
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter($"payload.event_type" === "click")
      .select($"event_id", $"payload.value")
    val plan = q.queryExecution.executedPlan.toString
    // pruned: only event_type+value inside the struct, tags absent
    assert(plan.contains("ReadSchema"), plan)
    val readSchema = plan.split("ReadSchema: ").last.split("\n").head
    assert(readSchema.contains("payload:struct<value:double,event_type:string>")
      || readSchema.contains("payload:struct<event_type:string,value:double>"),
      s"struct not pruned to the two read leaves: $readSchema")
    assert(!readSchema.contains("tags"), s"unused array column read: $readSchema")
    assert(!readSchema.contains("ts"), s"unused struct leaf read: $readSchema")
    // nested predicate pushed into the parquet scan
    assert(plan.contains("PushedFilters") &&
      plan.contains("payload.event_type"),
      s"nested predicate not pushed: $plan")
    // and the result is right
    assert(q.count() ==
      graft.Tables.events(spark, TestSpark.sf0001)
        .filter($"event_type" === "click").count())
  }

  test("video dedup self-joins decode the frame lineage exactly once") {
    // the frame decode dominates the gate's cost model at scale; the
    // ranked frame table is persisted (SCOPED — released before the
    // call returns) and the pair table checkpointed, so the decode
    // lineage is detached from the returned plan entirely: it cannot
    // re-execute under ANY downstream join/aggregate strategy, and the
    // returned plan must carry the checkpoint scan, not the decode —
    // asserted for containment AND temporal alignment. (The behavioral
    // exactly-once proof is MultimodalVideoSpec's accumulator test.)
    for (name <- Seq("dd_video_frames", "dd_video_align")) {
      val df = graft.SparkEntry.queries(name)(spark, TestSpark.sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ExistingRDD"),
        s"$name must consume the checkpointed pair table (decode " +
          s"lineage detached):\n$plan")
      // the decode lineage roots at a parquet scan of the corpus; a
      // detached plan has NO file scan at all — only the RDD scan
      assert(!plan.toLowerCase.contains("parquet"),
        s"$name returned plan must not carry the decode lineage:\n$plan")
      spark.catalog.clearCache()
    }
  }
}
