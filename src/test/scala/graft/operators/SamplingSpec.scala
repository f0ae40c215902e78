package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong).toDF("id")

  test("sampleFraction: deterministic, partitioning-invariant, right rate") {
    val df = ids(20000)
    def run(parts: Int): Set[Long] =
      Sampling.sampleFraction(df.repartition(parts), $"id", 0.3, "s1")
        .collect().map(_.getLong(0)).toSet
    val a = run(1)
    assert(run(8) == a && run(32) == a)
    val rate = a.size / 20000.0
    assert(math.abs(rate - 0.3) < 0.02, s"rate $rate")
    // a different salt draws a (near) independent sample
    val b = Sampling.sampleFraction(df, $"id", 0.3, "s2")
      .collect().map(_.getLong(0)).toSet
    val overlap = (a intersect b).size / 20000.0
    assert(math.abs(overlap - 0.09) < 0.02, s"overlap $overlap") // 0.3² = 0.09
  }

  test("u01 fast flavor: uniform in [0,1), deterministic, right rate") {
    val df = ids(20000)
    val u = df.select(Sampling.u01($"id", 7L).as("u"))
      .agg(min($"u"), max($"u"), avg($"u")).head()
    assert(u.getDouble(0) >= 0.0 && u.getDouble(1) < 1.0)
    assert(math.abs(u.getDouble(2) - 0.5) < 0.01, s"mean ${u.getDouble(2)}")
    val n1 = Sampling.sampleFractionFast(df, $"id", 0.25, 7L).count()
    val n2 = Sampling.sampleFractionFast(df.repartition(13), $"id", 0.25, 7L)
      .count()
    assert(n1 == n2)
    assert(math.abs(n1 / 20000.0 - 0.25) < 0.02, s"rate ${n1 / 20000.0}")
  }

  test("sampleExactN: exactly n, stable, plans as TakeOrdered") {
    val df = ids(5000).withColumn("payload", $"id" * 2)
    val s1 = Sampling.sampleExactN(df, $"id", 100, "k")
    assert(s1.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      s1.queryExecution.executedPlan.toString)
    val r1 = s1.collect().map(_.getLong(0)).toSeq
    val r2 = Sampling.sampleExactN(df.repartition(17), $"id", 100, "k")
      .collect().map(_.getLong(0)).toSeq
    assert(r1.size == 100 && r1.toSet == r2.toSet)
    // growing n only ADDS rows (prefix property of the hash order)
    val r3 = Sampling.sampleExactN(df, $"id", 200, "k")
      .collect().map(_.getLong(0)).toSet
    assert(r1.toSet.subsetOf(r3))
  }

  test("weightedMix: copies per stratum track the weights, copy index distinct") {
    val df = (1L to 8000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val weights = Map("s0" -> 0.0, "s1" -> 0.5, "s2" -> 1.0, "s3" -> 2.25)
    val out = Sampling.weightedMix(df, $"src", weights, $"id", "mix")
    val byStratum = out.groupBy($"src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byStratum.contains("s0"))
    assert(math.abs(byStratum("s1") / 2000.0 - 0.5) < 0.06)
    assert(byStratum("s2") == 2000L)
    assert(math.abs(byStratum("s3") / 2000.0 - 2.25) < 0.06)
    // (id, copy) pairs are distinct → downstream sees distinguishable rows
    assert(out.select($"id", $"copy").distinct().count() == out.count())
    // determinism across partitionings
    val out2 = Sampling.weightedMix(df.repartition(23), $"src", weights,
      $"id", "mix")
    assert(out2.orderBy($"id", $"copy").collect().toSeq ==
      out.orderBy($"id", $"copy").collect().toSeq)
  }

  test("sampleExactNPerStratum: exactly n per stratum, partitioning-stable") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
    def run(parts: Int): Seq[(Long, String)] =
      Sampling.sampleExactNPerStratum(df.repartition(parts), $"src", $"id",
          10, "strat-test")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val out = run(3)
    assert(out.size == 40)
    assert(out.groupBy(_._2).forall(_._2.size == 10))
    assert(out == run(17)) // same sample under any partitioning
  }

  test("pre-filter composition is exact while every stratum keeps >= n rows") {
    import spark.implicits._
    // the documented hot-stratum path: over-sample with the SAME salt
    // (keeps exactly the smallest hashes), then rank — must equal the
    // direct rank as long as each stratum retains >= n survivors
    val df = (1 to 2000).map(i => (i.toLong, s"s${i % 2}")).toDF("id", "src")
    val direct = Sampling.sampleExactNPerStratum(df, $"src", $"id", 20, "cmp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val pre = Sampling.sampleFraction(df, $"id", 0.2, "cmp")
    assert(pre.groupBy($"src").count().collect()
      .forall(_.getLong(1) >= 20), "premise: every stratum keeps >= n")
    val composed = Sampling.sampleExactNPerStratum(pre, $"src", $"id", 20, "cmp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(composed == direct)
  }

  test("packBins: sequential fill, budget-sized bins, partitioning-stable") {
    import spark.implicits._
    // 10 docs of 100 tokens each, budget 250 → bins of cum-prev/250:
    // docs 1-3 bin 0 (0,100,200), 4-5 bin 1 (300,400), 6-8 bin 2, 9-10 bin 3
    val df = (1 to 10).map(i => (i.toLong, "s", 100L)).toDF("id", "shard", "tok")
    def run(parts: Int): Seq[(Long, Long)] =
      Sampling.packBins(df.repartition(parts), $"shard", $"id", $"tok", 250L)
        .select($"id", $"bin").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
    val out = run(2)
    assert(out.map(_._2) == Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L, 2L, 3L, 3L), out.toString)
    assert(out == run(7))
    // bins track the budget within ±one doc (a bin's token total is the
    // cum span it covers, shifted by the previous bin's overshoot)
    val totals = out.groupBy(_._2).view.mapValues(_.size * 100L).toMap
    assert(totals.filterKeys(_ < 3L).values.forall(t => t > 150L && t < 350L),
      totals.toString)
  }

  test("packBins: tied order keys get per-row preceding sums via the ROWS frame") {
    import spark.implicits._
    // every doc shares ONE order value (priority 0) — the worst tie
    // case: under the default RANGE frame all six would share cum=600
    // and land in bin floor((600-100)/250)=2, skipping bins 0-1
    // entirely; the ROWS frame + doc_id tiebreak packs them
    // sequentially exactly like the unique-key case
    val df = (1 to 6).map(i => (i.toLong, 0L, "s", 100L))
      .toDF("id", "priority", "shard", "tok")
    def run(parts: Int): Seq[(Long, Long)] =
      Sampling.packBins(df.repartition(parts), $"shard", $"priority", $"tok",
        250L, $"id")
        .select($"id", $"bin").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
    val out = run(3)
    assert(out == Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 2L),
      out.toString)
    // deterministic under re-partitioning despite the fully-tied order key
    assert(out == run(5))
  }

  test("globalShuffleRank: a bijective, partitioning-invariant permutation") {
    val df = ids(5000)
    def run(parts: Int): Seq[(Long, Long)] =
      Sampling.globalShuffleRank(df.repartition(parts), $"id", "sh1")
        .select($"id", $"pos").as[(Long, Long)].collect().toSeq.sorted
    val a = run(1)
    // positions are exactly 1..n (a permutation, no gaps or dups)
    assert(a.map(_._2).sorted == (1L to 5000L))
    assert(run(8) == a && run(32) == a)
  }

  test("globalShuffleRank equals the single-window global rank") {
    val df = ids(3000)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(Sampling.hashHex($"id", "sh2"), $"id")
    val ref = df.withColumn("pos", row_number().over(w).cast("long"))
      .select($"id", $"pos").as[(Long, Long)].collect().toSet
    val got = Sampling.globalShuffleRank(df.repartition(16), $"id", "sh2")
      .select($"id", $"pos").as[(Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("range buckets: monotone boundaries, full assignment, balance") {
    val df = ids(40000).select(($"id" % 1000).cast("double").as("v"))
    val bounds = Sampling.rangeBucketBoundaries(df, $"v", 8)
    assert(bounds == bounds.sorted)
    val counts = Sampling.withRangeBucket(df.repartition(16), $"v", bounds)
      .groupBy($"bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf((0 until 8).toSet))
    assert(counts.values.sum == 40000L)
    // uniform data: every bucket within the absolute KLL envelope
    counts.values.foreach { n =>
      assert(math.abs(n / 40000.0 - 0.125) <= Sampling.RangeBucketTolAbs, n)
    }
    // deterministic replay: the same layout yields the same boundaries
    // (different merge trees may yield different — equally valid —
    // sketches; the ±2ε balance envelope is what holds for ALL of them)
    assert(Sampling.rangeBucketBoundaries(df, $"v", 8) == bounds)
  }

  test("sa_range_buckets gate: anchors exact, envelope booleans hold") {
    val row = Sampling.saRangeBuckets(spark, graft.TestSpark.sf0001).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Int]("n_buckets") == Sampling.RangeBuckets)
    assert(row(0).getAs[Boolean]("all_buckets_nonempty"))
    assert(row(0).getAs[Boolean]("max_share_ok"))
    assert(row(0).getAs[Boolean]("min_share_ok"))
  }

  test("split assignment is disjoint, exhaustive, growth-stable, near-proportioned") {
    import spark.implicits._
    val docs = (1L to 10000L).toDF("doc_id")
    val split = docs.select($"doc_id",
      Sampling.splitAssign($"doc_id", "sp-spec", 0.8, 0.1).as("split"))
    val counts = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L) // exhaustive by construction
    assert(math.abs(counts("train") - 8000L) < 300, counts)
    assert(math.abs(counts("val") - 1000L) < 150, counts)
    assert(math.abs(counts("test") - 1000L) < 150, counts)
    // growth stability: assignments of existing rows never change when
    // the corpus grows (the eval-contamination guarantee)
    val grown = (1L to 20000L).toDF("doc_id")
      .select($"doc_id", Sampling.splitAssign($"doc_id", "sp-spec", 0.8, 0.1)
        .as("split"))
    val before = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = grown.filter($"doc_id" <= 10000).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == after)
  }

  test("temperature mix flattens source shares toward sqrt weights") {
    import spark.implicits._
    // 3 sources with 16:4:1 size ratio → sqrt weights 4:2:1
    val docs = ((1 to 3200).map(i => (i.toLong, "big")) ++
      (3201 to 4000).map(i => (i.toLong, "mid")) ++
      (4001 to 4200).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val budget = 700L
    val sel = Sampling.temperatureMixSqrt(docs, $"source", $"doc_id",
      budget, "t-spec")
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected ≈ budget·w/totW: big 400, mid 200, small 100 — the raw
    // proportional split would be 560/140/35
    assert(math.abs(sel("big") - 400.0) < 80, sel)
    assert(math.abs(sel("mid") - 200.0) < 60, sel)
    assert(math.abs(sel("small") - 100.0) < 40, sel)
    // deterministic and partitioning-invariant
    val again = Sampling.temperatureMixSqrt(docs.repartition(13), $"source",
      $"doc_id", budget, "t-spec").select($"doc_id").as[Long].collect().toSet
    val ref = Sampling.temperatureMixSqrt(docs, $"source", $"doc_id",
      budget, "t-spec").select($"doc_id").as[Long].collect().toSet
    assert(again == ref)
    // a rate ≥ 1 keeps the whole source (the clamp branch)
    val tiny = ((1 to 5).map(i => (i.toLong, "a")) ++
      (6 to 5000).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    val keptA = Sampling.temperatureMixSqrt(tiny, $"source", $"doc_id",
      4000L, "t-spec2").filter($"source" === "a").count()
    assert(keptA == 5L)
  }

  test("temperature mix fast flavor matches sqrt-weight expectations") {
    import spark.implicits._
    val docs = ((1 to 3200).map(i => (i.toLong, "big")) ++
      (3201 to 4000).map(i => (i.toLong, "mid"))).toDF("doc_id", "source")
    val sel = Sampling.temperatureMixFast(docs, $"source", $"doc_id",
      600L, 0xA11CEL)
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt weights ≈ 56.6:28.3 → 2:1 split of 600
    assert(math.abs(sel("big") - 400.0) < 80, sel)
    assert(math.abs(sel("mid") - 200.0) < 60, sel)
  }

  test("sa_temperature_mix gate selects a plausible budget-sized sample") {
    val sel = Sampling.saTemperatureMix(spark, TestSpark.sf0001)
    val n = sel.count()
    assert(n > 0 && n < 2 * Sampling.TempBudget, n)
  }

  test("gate queries run and cover all three weight regimes") {
    val mix = Sampling.saWeightedMix(spark, TestSpark.sf0001)
    val n = mix.count()
    // expected total = 500 docs/20 sources = 25 per source × Σ weights
    val expected = Sampling.MixWeights.values.sum * 25
    assert(math.abs(n - expected) < expected * 0.15, s"$n vs $expected")
    assert(Sampling.saSampleN(spark, TestSpark.sf0001).count() ==
      Sampling.SampleN)
  }
}
