package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** A user table whose columns are named `fp`, `start`, and `len` —
  * the names the DV-runs frame uses internally — must survive every
  * delete/read path: the runs side joins under reserved `__dv_`
  * names, so the conditions can never become ambiguous. Covers the
  * broadcast DV path, the shuffled range anti-join fallback
  * (broadcastRuns=0), and deleteWhere's already-deleted anti-join
  * (a second delete on a DV'd table). */
class CowDvReservedColsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_cow_rescol").resolve("t").toString

  private def build(): String = {
    val t = freshTable()
    val df = (0L until 100L).map(i => (i, s"f$i", i * 2, i * 3))
      .toDF("id", "fp", "start", "len")
      .repartitionByRange(4, col("id"))
    CowTable.init(df, t)
    t
  }

  private def ids(t: String): Set[Long] =
    CowTable.read(spark, t).select("id").as[Long].collect().toSet

  test("delete + broadcast-DV read on a table with fp/start/len columns") {
    val t = build()
    CowTable.deleteWhere(spark, t, col("id") % 10 === 3)
    assert(ids(t) == (0L until 100L).filter(_ % 10 != 3).toSet)
    // second delete: the already-deleted anti-join runs against the
    // existing DV under reserved names
    CowTable.deleteWhere(spark, t, col("start") >= 180L) // id >= 90
    assert(ids(t) ==
      (0L until 90L).filter(_ % 10 != 3).toSet)
  }

  test("shuffled range anti-join fallback is collision-free too") {
    val t = build()
    CowTable.deleteWhere(spark, t, col("len") % 9 === 0) // id % 3 == 0
    val key = "spark.graft.cow.dv.broadcastRuns"
    spark.conf.set(key, "0")
    try assert(ids(t) == (0L until 100L).filter(_ % 3 != 0).toSet)
    finally spark.conf.unset(key)
  }
}
