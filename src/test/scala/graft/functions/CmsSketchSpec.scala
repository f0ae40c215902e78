package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CmsSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def zipf(items: Int, c: Int): Seq[String] =
    (1 to items).flatMap(i => Seq.fill(c / i)(f"item$i%03d"))

  private def exact(data: Seq[String]): Map[String, Long] =
    data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def sketchBytes(data: Seq[String], depth: Int, width: Int,
      parts: Int): Array[Byte] =
    data.toDF("v").repartition(parts)
      .agg(CmsFunctions.cms_sketch($"v", depth, width).as("sk"))
      .head().getAs[Array[Byte]](0)

  test("byte-identical under any partitioning (merge = pointwise sums)") {
    val data = zipf(100, 1000)
    val ref = sketchBytes(data, 4, 64, 1)
    for (parts <- Seq(7, 32)) {
      assert(java.util.Arrays.equals(ref, sketchBytes(data, 4, 64, parts)),
        s"parts=$parts")
    }
  }

  test("never undercounts; min-over-rows bound holds on a planted Zipf") {
    val data = zipf(200, 2000)
    val truth = exact(data)
    val n = data.size.toLong
    val width = 32
    val bytes = sketchBytes(data, 4, width, 13)
    val bound = math.E * n / width
    var failures = 0
    truth.foreach { case (item, c) =>
      val est = CmsKernel.estimateString(bytes, item)
      assert(est >= c, s"undercount for $item: $est < $c")
      if (est > c + bound) failures += 1
    }
    // per-item failure probability e^-depth ≈ 0.018; on 200 items a
    // handful of exceedances would still flag a broken kernel
    assert(failures <= 3, s"$failures items exceeded the e·N/w bound")
  }

  test("absent items estimate only collision mass") {
    val data = zipf(50, 500)
    val bytes = sketchBytes(data, 4, 256, 5)
    // wide sketch, small vocab: an unseen item should hit an empty cell
    // in at least one of the 4 rows with overwhelming probability
    assert(CmsKernel.estimateString(bytes, "never-inserted") === 0L)
  }

  test("stored sketches merge associatively to the union's counters") {
    val a = zipf(40, 600)
    val b = zipf(90, 400) ++ Seq.fill(250)("item001")
    val c = Seq.fill(100)("only-in-c")
    def bytes(d: Seq[String]) = sketchBytes(d, 4, 64, 3)
    val unionBytes = bytes(a ++ b ++ c)
    val mergedLeft = CmsKernel.merged(CmsKernel.merged(bytes(a), bytes(b)), bytes(c))
    val mergedRight = CmsKernel.merged(bytes(a), CmsKernel.merged(bytes(b), bytes(c)))
    assert(java.util.Arrays.equals(mergedLeft, unionBytes))
    assert(java.util.Arrays.equals(mergedRight, unionBytes))
    assert(CmsKernel.deserialize(mergedLeft).processed ===
      (a.size + b.size + c.size).toLong)
  }

  test("merge rejects shape mismatch; reader rejects foreign bytes") {
    val d = zipf(10, 100)
    val e1 = intercept[IllegalArgumentException] {
      CmsKernel.merged(sketchBytes(d, 4, 64, 1), sketchBytes(d, 4, 128, 1))
    }
    assert(e1.getMessage.contains("shape mismatch"))
    val e2 = intercept[IllegalArgumentException] {
      CmsKernel.deserialize(Array.fill[Byte](64)(7))
    }
    assert(e2.getMessage.contains("format mismatch"))
  }

  test("SQL surface: cms_sketch registered with foldable-literal args") {
    GraftFunctions.register(spark)
    zipf(20, 200).toDF("v").createOrReplaceTempView("cms_in")
    val bytes = spark.sql("SELECT cms_sketch(v, 4, 64) AS sk FROM cms_in")
      .head().getAs[Array[Byte]](0)
    assert(CmsKernel.estimateString(bytes, "item001") >= 200L)
    val err = intercept[Exception] {
      spark.sql("SELECT cms_sketch(v, 4, v) FROM cms_in").collect()
    }
    assert(err.getMessage.contains("width"))
  }
}
