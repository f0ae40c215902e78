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
}
