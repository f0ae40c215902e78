package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Changelog

/** End-to-end freshness loop: a sums-only MV maintained incrementally by
  * Changelog.aggMaintain (DBSP retract-add) is registered for the
  * updated base snapshot and transparently serves queries through
  * MvRewriteRule — the full "maintain cheaply, serve from the summary"
  * contract, with min/max rewrites refused because a retract-add MV
  * cannot carry them. */
class MvMaintainServeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val key = Seq("id")
  private def versions = Seq(col("v"))
  private def isDelete = col("op") === "d"
  private val payload = Seq("k", "amount", "v")

  /** The MV definition: per-category count + exact long sum (additive,
    * so retraction is sound). */
  private def stateAgg(df: DataFrame): DataFrame =
    df.groupBy("k").agg(count(lit(1)).as("cnt"), sum(col("amount")).as("sum_amount"))

  private val root = java.nio.file.Files
    .createTempDirectory("graft_mv_loop").toString

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  private def baseQuery(path: String): DataFrame =
    spark.read.parquet(path).groupBy("k")
      .agg(sum(col("amount")).as("s"), count(lit(1)).as("c"))

  private def rows(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("maintained MV serves the rewrite across a changelog cycle") {
    val snap0 = Seq(
      (1L, "a", 10L, 1L, "u"), (2L, "a", 20L, 1L, "u"),
      (3L, "b", 30L, 1L, "u"),
    ).toDF("id", "k", "amount", "v", "op")
    val base1 = s"$root/base_v1"; val mvP1 = s"$root/mv_v1"
    snap0.write.parquet(base1)
    stateAgg(snap0).write.parquet(mvP1)

    MvCatalog.clear()
    val want1 = rows(baseQuery(base1)) // computed from the base files
    MvCatalog.register(spark, "sales_by_k", base1, Seq("k"), Seq("amount"), mvP1)
    MvRewriteApi.enable(spark)
    val served1 = baseQuery(base1)
    assert(scanPaths(served1).forall(_.contains("mv_v1")))
    assert(rows(served1) == want1)

    // changelog slice: id2 migrates a→b with a new amount, id3 deleted,
    // id4 inserted into a brand-new group
    val slice = Seq(
      (2L, "b", 25L, 2L, "u"), (3L, "b", 0L, 2L, "d"), (4L, "c", 40L, 2L, "u"),
    ).toDF("id", "k", "amount", "v", "op")

    // base v2 = applied snapshot; MV v2 = retract-add maintenance (no
    // rescan of untouched state), both written as new immutable versions
    val snap1 = Changelog.applyChangelog(snap0, slice, key, versions,
      isDelete, payload).withColumn("op", lit("u"))
    val base2 = s"$root/base_v2"; val mvP2 = s"$root/mv_v2"
    snap1.write.parquet(base2)
    Changelog.aggMaintain(spark.read.parquet(mvP1), snap0, slice, key,
      versions, isDelete, payload, stateAgg, Seq("k"), "cnt")
      .write.parquet(mvP2)

    // the maintained MV is exactly the rebuilt one
    val rebuilt = stateAgg(spark.read.parquet(base2))
      .collect().map(_.toString).sorted.toSeq
    val maintained = spark.read.parquet(mvP2)
      .select("k", "cnt", "sum_amount").collect().map(_.toString).sorted.toSeq
    assert(maintained == rebuilt)

    MvCatalog.clear()
    val want2 = rows(baseQuery(base2))
    assert(want2 == Set(("a", 10L, 1L), ("b", 25L, 1L), ("c", 40L, 1L)))
    MvCatalog.register(spark, "sales_by_k", base2, Seq("k"), Seq("amount"), mvP2)
    MvRewriteApi.enable(spark)
    val served2 = baseQuery(base2)
    assert(scanPaths(served2).forall(_.contains("mv_v2")))
    assert(rows(served2) == want2)
  }

  test("min/max rewrites are refused on a sums-only MV") {
    val base1 = s"$root/base_v1" // written by the previous test
    MvCatalog.register(spark, "sales_by_k", base1, Seq("k"), Seq("amount"),
      s"$root/mv_v1")
    MvRewriteApi.enable(spark)
    val q = spark.read.parquet(base1).groupBy("k")
      .agg(min(col("amount")).as("lo"), sum(col("amount")).as("s"))
    val paths = scanPaths(q)
    assert(paths.exists(_.contains("base_v1")) && !paths.exists(_.contains("mv_v1")),
      s"sums-only MV must not serve min(): $paths")
    // avg needs the per-measure non-null count this MV also lacks
    val qa = spark.read.parquet(base1).groupBy("k")
      .agg(avg(col("amount")).as("a"))
    assert(scanPaths(qa).exists(_.contains("base_v1")) &&
      !scanPaths(qa).exists(_.contains("mv_v1")))
    // but a sum/count-only query on the same registration is served
    assert(scanPaths(baseQuery(base1)).forall(_.contains("mv_v1")))
  }
}
