package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sketch-backed drift ([[DataQuality.driftReportSketched]]): bounded
  * state per column regardless of support size — KLL quantile-bin TV
  * for numeric columns, CMS+heavy-hitter TV for categoricals. The spec
  * pins the estimates against EXACT total-variation on planted drifts
  * over a high-cardinality column, and the bounded-state claim (no
  * by-value histogram ever leaves the executors). */
class DataQualitySketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def base(n: Int) = spark.range(n.toLong)
    .select($"id",
      ($"id" * 7L % 100003L).cast("double").as("v"),
      concat(lit("u"), ($"id" * 13L % 99991L).cast("string")).as("c"))

  test("planted numeric shift: KLL TV estimate lands within 0.05 of exact; " +
      "verdicts match") {
    val ref = base(60000)
    val cur = base(60000).withColumn("v",
      when(pmod($"id", lit(3)) === 0, $"v" + 1.0e7).otherwise($"v"))
    val rep = DataQuality.driftReportSketched(cur, ref,
      Seq(DataQuality.KllDrift("v", bins = 32, k = 400)))
      .collect().map(r => (r.getString(0), r.getDouble(4), r.getBoolean(5)))
    val (_, tvEst, drifted) = rep.head
    // exact TV of the planted shift: a third of the mass moved out of
    // the original support entirely
    assert(math.abs(tvEst - 1.0 / 3.0) <= 0.05, s"tvEst=$tvEst")
    assert(drifted)
    // control: same distribution both sides
    val ctl = DataQuality.driftReportSketched(ref, ref,
      Seq(DataQuality.KllDrift("v", bins = 32, k = 400)))
      .collect().head
    assert(ctl.getDouble(4) <= 0.05 && !ctl.getBoolean(5))
  }

  test("planted categorical collapse: CMS+HH TV estimate within 0.05 of " +
      "exact; verdicts match") {
    val ref = base(60000)
    val cur = base(60000).withColumn("c",
      when(pmod($"id", lit(5)) === 0, lit("HOT")).otherwise($"c"))
    val rep = DataQuality.driftReportSketched(cur, ref,
      Seq(DataQuality.CmsDrift("c"))).collect().head
    // exact TV ~ 0.2: a fifth of the mass collapsed onto one value
    assert(math.abs(rep.getDouble(4) - 0.2) <= 0.05,
      s"tvEst=${rep.getDouble(4)}")
    assert(rep.getBoolean(5))
    val ctl = DataQuality.driftReportSketched(ref, ref,
      Seq(DataQuality.CmsDrift("c"))).collect().head
    assert(ctl.getDouble(4) <= 0.05 && !ctl.getBoolean(5))
  }

  test("empty sides are safe and report no drift") {
    val ref = base(1000)
    val empty = base(0)
    val rep = DataQuality.driftReportSketched(empty, ref,
      Seq(DataQuality.KllDrift("v"), DataQuality.CmsDrift("c")))
      .collect()
    assert(rep.length == 2)
    rep.foreach(r => assert(r.getLong(3) == 0L)) // n_cur = 0
  }

  test("versioned sketch drift: time travel pins the reference, two " +
      "partial-column upserts plant the drift, doubly-hit keys compose") {
    val t = s"${System.getProperty("java.io.tmpdir")}/graft_cow/" +
      java.util.UUID.randomUUID().toString.take(8)
    val b = base(30000).select($"id", $"v", $"c")
    CowTable.init(b, t)
    CowTable.upsertMor(spark, t,
      b.filter(pmod($"id", lit(3)) === 0)
        .select($"id", ($"v" + 1.0e7).as("v")),
      Seq("id"), preserveMissing = true)
    CowTable.upsertMor(spark, t,
      b.filter(pmod($"id", lit(5)) === 0)
        .select($"id", lit("HOT").as("c")),
      Seq("id"), preserveMissing = true)
    val rep = DataQuality.driftReportSketched(
      CowTable.read(spark, t), CowTable.readVersion(spark, t, 0),
      Seq(DataQuality.KllDrift("v"), DataQuality.CmsDrift("c")))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(4), r.getBoolean(5)))).toMap
    assert(math.abs(rep("v")._1 - 1.0 / 3.0) <= 0.05 && rep("v")._2)
    assert(math.abs(rep("c")._1 - 0.2) <= 0.05 && rep("c")._2)
    // a key both upserts touched (id ≡ 0 mod 15) must carry the FIRST
    // upsert's shifted v THROUGH the second partial upsert — preserve
    // reads the newest live postimage, not the base preimage
    val both = CowTable.read(spark, t)
      .filter(pmod($"id", lit(15)) === 0 && $"id" > 0)
      .select($"v" > 1.0e6, $"c" === "HOT").collect()
    assert(both.nonEmpty &&
      both.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }

  test("KLL cdf is monotone and hits the endpoints") {
    val st = new graft.functions.KllState(200)
    (1 to 10000).foreach(i => st.insert(i.toDouble))
    val cdf = st.cdf(Array(0.0, 2500.0, 5000.0, 7500.0, 10000.0))
    assert(cdf(0) == 0.0 && cdf(4) == 1.0)
    assert(cdf.sliding(2).forall(p => p(0) <= p(1)))
    assert(math.abs(cdf(2) - 0.5) < 0.02)
  }
}
