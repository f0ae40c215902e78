package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.AmsFunctions._

class AmsSketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sketchOf(values: Seq[Long], depth: Int = 5,
      width: Int = 1024): Array[Byte] =
    values.toDF("k").agg(ams_sketch($"k", depth, width))
      .head().getAs[Array[Byte]](0)

  test("collision-free inner product is EXACT (signs square to 1)") {
    // A = {7×3, 8×1}, B = {7×2, 9×5} -> |A⋈B| = 3·2 = 6; with width 1024
    // and 4 distinct keys there are no bucket collisions, so every row's
    // dot product is exactly 6 and the median is exact
    val a = sketchOf(Seq(7L, 7L, 7L, 8L))
    val b = sketchOf(Seq(7L, 7L, 9L, 9L, 9L, 9L, 9L))
    assert(AmsKernel.joinEstimate(a, b) == 6.0)
    // F2(A) = 3² + 1² = 10, F2(B) = 2² + 5² = 29
    assert(AmsKernel.selfJoinEstimate(a) == 10.0)
    assert(AmsKernel.selfJoinEstimate(b) == 29.0)
  }

  test("disjoint key sets estimate a zero-row join") {
    val a = sketchOf(Seq(1L, 2L, 3L))
    val b = sketchOf(Seq(100L, 200L))
    assert(AmsKernel.joinEstimate(a, b) == 0.0)
  }

  test("sketch bytes are identical under any partitioning and via merge") {
    val vals = (0L until 5000L).map(i => i % 97)
    val whole = vals.toDF("k").agg(ams_sketch($"k"))
      .head().getAs[Array[Byte]](0)
    val repart = vals.toDF("k").repartition(13)
      .agg(ams_sketch($"k")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, repart))
    val (lo, hi) = vals.splitAt(1234)
    val merged = AmsKernel.merged(sketchOf(lo), sketchOf(hi))
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("shape and format mismatches are typed errors") {
    val a = sketchOf(Seq(1L), depth = 5, width = 512)
    val b = sketchOf(Seq(1L), depth = 5, width = 1024)
    val e1 = intercept[IllegalArgumentException] {
      AmsKernel.joinEstimate(a, b)
    }
    assert(e1.getMessage.contains("shape mismatch"))
    val poisoned = a.clone(); poisoned(0) = 0x7f.toByte
    val e2 = intercept[IllegalArgumentException] {
      AmsKernel.deserialize(poisoned)
    }
    assert(e2.getMessage.contains("format mismatch"))
  }

  test("unsupported column type is an analysis-time failure") {
    val e = intercept[Exception] {
      Seq(1.5).toDF("x").agg(ams_sketch($"x")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("ams_sketch"))
  }

  test("SQL surface: ams_sketch registered with foldable args") {
    GraftFunctions.register(spark)
    Seq(1L, 2L).toDF("k").createOrReplaceTempView("ams_in")
    val bytes = spark.sql("SELECT ams_sketch(k, 3, 256) FROM ams_in")
      .head().getAs[Array[Byte]](0)
    val st = AmsKernel.deserialize(bytes)
    assert(st.depth == 3 && st.width == 256 && st.processed == 2L)
  }

  test("gate envelope holds with margin on the real join (sf0.001)") {
    val o = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey").cast("long").as("k"))
    val l = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey").cast("long").as("k"))
    val skO = o.agg(ams_sketch($"k")).head().getAs[Array[Byte]](0)
    val skL = l.agg(ams_sketch($"k")).head().getAs[Array[Byte]](0)
    val exact = o.join(l, "k").count().toDouble
    val exactF2 = l.groupBy("k").agg(count(lit(1)).as("c"))
      .agg(sum($"c" * $"c")).head().getLong(0).toDouble
    val estJ = AmsKernel.joinEstimate(skO, skL)
    val estF2 = AmsKernel.selfJoinEstimate(skL)
    val relJ = math.abs(estJ - exact) / exact
    val relF2 = math.abs(estF2 - exactF2) / exactF2
    info(f"join: est $estJ%.0f vs exact $exact%.0f (rel $relJ%.4f); " +
      f"F2: est $estF2%.0f vs exact $exactF2%.0f (rel $relF2%.4f)")
    // gate bound is 0.2; require half of it here so the gate has margin
    assert(relJ <= 0.1, f"join estimate rel err $relJ%.4f")
    assert(relF2 <= 0.1, f"F2 estimate rel err $relF2%.4f")
  }
}
