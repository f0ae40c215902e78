package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish planted corpus: item i appears ~ C/i times — real skew,
    * unlike the near-uniform synthetic tables. */
  private def zipf(items: Int, c: Int): Seq[String] =
    (1 to items).flatMap(i => Seq.fill(c / i)(f"item$i%03d"))

  private def exact(data: Seq[String]): Map[String, Long] =
    data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def estimates(data: Seq[String], k: Int, parts: Int)
      : Map[String, Long] =
    data.toDF("v").repartition(parts)
      .agg(HeavyHitterFunctions.heavy_hitters($"v", k).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact below capacity, under any partitioning") {
    val data = zipf(20, 400)
    val truth = exact(data)
    for (parts <- Seq(1, 7, 32)) {
      assert(estimates(data, k = 64, parts) == truth, s"parts=$parts")
    }
  }

  test("over capacity: MG bounds hold under any partitioning") {
    val data = zipf(200, 2000) // ~1175 distinct-weighted stream
    val truth = exact(data)
    val n = data.size.toLong
    for (parts <- Seq(1, 7, 32)) {
      val k = 16
      val est = estimates(data, k, parts)
      val slack = n.toDouble / (k + 1)
      assert(est.size <= k)
      // every stored counter: c - N/(k+1) <= est <= c
      est.foreach { case (item, e) =>
        val c = truth(item)
        assert(e <= c, s"overestimate for $item: $e > $c (parts=$parts)")
        assert(c - e <= slack, s"$item err ${c - e} > $slack (parts=$parts)")
      }
      // every item frequent beyond the bound is retained
      truth.filter(_._2 > slack).keys.foreach { item =>
        assert(est.contains(item), s"lost heavy item $item (parts=$parts)")
      }
    }
  }

  test("stored sketches merge: per-shard bytes combine to the union's bounds") {
    val shard1 = zipf(50, 800)
    val shard2 = zipf(120, 500) ++ Seq.fill(300)("item001")
    val k = 16
    val sketches = (shard1.map(("a", _)) ++ shard2.map(("b", _)))
      .toDF("shard", "v")
      .groupBy($"shard")
      .agg(HeavyHitterFunctions.heavy_hitters_sketch($"v", k).as("sk"))
    // combine the two shard sketches into one
    val merged = sketches.agg(collect_list($"sk").as("sks"))
      .select(HeavyHitterFunctions.hh_merge(element_at($"sks", 1),
        element_at($"sks", 2)).as("m"))
      .select(HeavyHitterFunctions.hh_items($"m").as("items"),
        HeavyHitterFunctions.hh_processed($"m").as("n"))
      .head()
    val all = shard1 ++ shard2
    val truth = exact(all)
    val n = merged.getLong(1)
    assert(n == all.size.toLong)
    val slack = n.toDouble / (k + 1)
    val items = merged.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    items.foreach { case (item, e) =>
      val c = truth(item)
      assert(e <= c && c - e <= slack, s"$item est $e vs $c")
    }
    truth.filter(_._2 > slack).keys.foreach(i => assert(items.contains(i)))
  }

  test("sql registration: heavy_hitters usable from spark.sql") {
    GraftFunctions.register(spark)
    zipf(10, 100).toDF("v").createOrReplaceTempView("hh_input")
    val rows = spark.sql(
      """SELECT e.item, e.est FROM (
        |  SELECT explode(heavy_hitters(v, 64)) AS e FROM hh_input)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == exact(zipf(10, 100)))
  }

  test("non-string input is rejected at analysis") {
    val e = intercept[Exception] {
      Seq(1, 2, 3).toDF("v")
        .agg(HeavyHitterFunctions.heavy_hitters($"v")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"), e.getMessage)
  }
}
