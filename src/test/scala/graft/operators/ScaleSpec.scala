package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted sum equals plain sum on skewed data") {
    import spark.implicits._
    // one hot key (90%) + long tail; (k, v) is unique per row → stable salt
    val df = ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val plain = df.groupBy($"k").agg(sum($"v").as("total"), count(lit(1)).as("n"))
      .orderBy($"k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val salted = Scale.saltedSum(df, $"k", $"v", salts = 8, Seq($"k", $"v"))
      .orderBy($"key").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join equals plain join on skewed keys") {
    import spark.implicits._
    val left = ((1 to 500).map(i => (1L, i)) ++ Seq((2L, 501), (3L, 502)))
      .toDF("id", "rn")
    val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("id", "tag")
    val plain = left.join(right, "id").groupBy($"id", $"tag").count()
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val salted = Scale.saltedJoin(left, right, "id", salts = 4, Seq($"id", $"rn"))
      .groupBy($"id", $"tag").count()
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltOf spreads a hot key across salt buckets") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (1L, i)).toDF("id", "rn")
    val buckets = left.withColumn("__salt", Scale.saltOf(Seq($"rn"), 8))
      .groupBy($"__salt").count().collect()
    assert(buckets.length == 8) // all 8 buckets occupied
    assert(buckets.map(_.getAs[Long]("count")).max < 1000)
    assert(buckets.map(_.getAs[Int]("__salt")).forall(s => s >= 0 && s < 8))
  }

  test("chooseSalts scales with observed skew and disables on uniform keys") {
    import spark.implicits._
    // 90% hot key at P=32 → need ~29 salts; uniform 100 keys → 1 (off)
    val skewed = ((1 to 9000).map(i => ("hot", i)) ++
      (1 to 1000).map(i => (s"k${i % 100}", i))).toDF("k", "v")
    val skewedSalts = Scale.chooseSalts(skewed, $"k", 32, sampleFrac = 0.5)
    assert(skewedSalts >= 24 && skewedSalts <= 32, s"got $skewedSalts")
    val uniform = (1 to 10000).map(i => (s"k${i % 100}", i)).toDF("k", "v")
    assert(Scale.chooseSalts(uniform, $"k", 32, sampleFrac = 0.5) == 1)
    // and the adaptive wrapper still sums correctly
    val plain = skewed.groupBy($"k").agg(sum($"v").as("total"))
      .orderBy($"k").collect().map(r => (r.getString(0), r.getLong(1)))
    val adaptive = Scale.saltedSumAdaptive(skewed, $"k", $"v", Seq($"k", $"v"))
      .select($"key", $"total".cast("long"), $"n")
      .orderBy($"key").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(adaptive.toSeq == plain.toSeq)
  }

  test("bloom-pruned join equals the plain join and prunes at the scan") {
    import spark.implicits._
    // repartition so the big side is a real scan, not a LocalRelation
    // (Catalyst folds filters over LocalRelation at optimization time,
    // which would hide the membership filter from the plan assert)
    val big = (1L to 20000L).map(i => (i % 4000, i)).toDF("k", "payload")
      .repartition(4)
    // small side matches 2.5% of the big side's keys
    val small = (1L to 100L).map(i => (i * 7 % 4000, i)).toDF("k", "tag")
    val pruned = Scale.bloomPrunedJoin(big, small, "k", 100L)
    val plain = big.join(small, Seq("k"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)

    // measured reduction: the filter keeps far fewer rows than the scan
    val kept = big.filter(graft.functions.BloomFunctions
      .bloom_might_contain_bc(
        spark.sparkContext.broadcast(
          small.agg(graft.functions.BloomFunctions
            .bloom_sketch($"k", 100L).as("sk")).head().getAs[Array[Byte]](0)),
        $"k")).count()
    val matching = big.join(small.select($"k").distinct(), Seq("k")).count()
    assert(kept >= matching) // no false negatives
    assert(kept <= matching + (0.05 * 20000).toLong, // ~1% FPP + slack
      s"kept=$kept matching=$matching")
  }

  test("sc_bloom_join gate: membership filter sits on the parquet scan") {
    val gate = Scale.scBloomJoin(spark, graft.TestSpark.sf0001)
    // plan asserts run against the parquet-backed gate (a LocalRelation
    // fixture gets its filter constant-folded away at optimization time)
    val plan = gate.queryExecution.executedPlan.toString
    assert(plan.contains("bloommightcontainbroadcast"), plan)
    assert(plan.length < 100000) // sketch rides a broadcast, not a literal
    val row = gate.head()
    assert(row.getAs[Long]("n_rows") > 0)
  }

  test("saltOf is deterministic under re-partitioning (retry safety)") {
    import spark.implicits._
    // The salt is a pure function of the stable columns, so recomputing it
    // on a differently-partitioned copy of the data (≈ a retried map
    // attempt) must yield the same assignment per row — the property that
    // makes salting safe as a shuffle key under partial stage retry.
    val df = (1 to 500).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    def salts(parts: Int): Map[Long, Int] =
      df.repartition(parts)
        .withColumn("__salt", Scale.saltOf(Seq($"id", $"payload"), 16))
        .select($"id", $"__salt").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(salts(3) == salts(17))
  }

  test("skewReport: exact counts, deterministic tie-break, salts match chooseSalts' formula") {
    import spark.implicits._
    // 80 rows of key 7, 10 each of keys 1 and 2 (tie, largest key wins)
    val df = (Seq.fill(80)(7L) ++ Seq.fill(10)(1L) ++ Seq.fill(10)(2L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row")
    val r = Scale.skewReport(df, $"k", parallelism = 10).head()
    assert(r.getAs[Long]("top_key") == 7L)
    assert(r.getAs[Long]("top_rows") == 80L)
    assert(r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("salts") == 8L) // ceil(0.8 * 10)
    // tie case: two equally-heavy keys -> largest key reported
    val tie = (Seq.fill(5)(3L) ++ Seq.fill(5)(9L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row")
    assert(Scale.skewReport(tie, $"k", 10).head().getAs[Long]("top_key") == 9L)
    // uniform keys -> 1 salt (the zero-overhead common case)
    val uni = (1L to 100L).map(k => (k, k)).toDF("k", "row")
    assert(Scale.skewReport(uni, $"k", 32).head().getAs[Long]("salts") == 1L)
  }
}
