package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted sum equals plain sum on skewed data") {
    import spark.implicits._
    // one hot key (90%) + long tail
    val df = ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val plain = df.groupBy($"k").agg(sum($"v").as("total"), count(lit(1)).as("n"))
      .orderBy($"k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val salted = Scale.saltedSum(df, $"k", $"v", salts = 8)
      .orderBy($"key").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join equals plain join on skewed keys") {
    import spark.implicits._
    val left = ((1 to 500).map(_ => 1L) ++ Seq(2L, 3L)).toDF("id")
    val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("id", "tag")
    val plain = left.join(right, "id").groupBy($"id", $"tag").count()
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val salted = Scale.saltedJoin(left, right, "id", salts = 4)
      .groupBy($"id", $"tag").count()
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join spreads the hot key across salt buckets") {
    import spark.implicits._
    val left = (1 to 1000).map(_ => 1L).toDF("id")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8)))
    val buckets = salted.groupBy($"__salt").count().collect()
    assert(buckets.length == 8) // all 8 buckets occupied
    assert(buckets.map(_.getAs[Long]("count")).max < 1000)
  }
}
