package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.CowTable

/** Data skipping as an optimizer rule: a plain read().filter() over a
  * registered CoW snapshot re-plans its scan over the stats-surviving
  * files, with output attributes and row-level semantics intact. */
class CowSkipSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cow_skip/" +
      java.util.UUID.randomUUID().toString.take(8)

  /** 4 files clustered by id ranges of 25 (the CowStatsSpec layout). */
  private def clustered(): String = {
    val t = freshTable()
    val df = (0L until 100L).map { i =>
      (i, i % 7, i * 0.5, s"s$i", (i / 25 + 1).toInt)
    }.toDF("id", "band", "v", "s", "__f")
    CowTable.initFiled(df, t, "__f", 4)
    t
  }

  private def dataScanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten.filter(_.contains("/data/"))

  test("a plain filter over a cow read plans only the surviving files") {
    val t = clustered()
    CowSkipApi.enable(spark)
    val base = CowTable.read(spark, t)
    val q = base.filter($"id".between(30L, 40L))
    assert(dataScanPaths(q).size == 1,
      s"expected 1 planned file, got ${dataScanPaths(q)}")
    // row-level semantics intact (the Filter stays above the scan)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (30L to 40L))
    // expressions above keep resolving against the SAME attributes
    val agg = base.filter($"id" === 77L)
      .groupBy($"band").agg(sum($"v").as("sv"))
    assert(dataScanPaths(agg).size == 1)
    assert(agg.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((77L % 7, 38.5)))
  }

  test("skipping composes with the deletion-vector anti-join") {
    val t = clustered()
    CowSkipApi.enable(spark)
    CowTable.deleteWhere(spark, t, $"id" === 35L)
    val q = CowTable.read(spark, t).filter($"id".between(30L, 40L))
    assert(dataScanPaths(q).size == 1, s"got ${dataScanPaths(q)}")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
      ((30L to 40L).filterNot(_ == 35L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dvrunscontain"), s"DV probe lost:\n$plan")
  }

  test("unsupported predicates and foreign scans are left untouched") {
    val t = clustered()
    CowSkipApi.enable(spark)
    val opaque = CowTable.read(spark, t).filter(pmod($"id", lit(9)) === 4)
    assert(dataScanPaths(opaque).size == 4, "opaque predicate was pruned")
    assert(opaque.count() == 11)
    // an ordinary parquet scan (not a registered snapshot) never matches
    val loose = java.nio.file.Files.createTempDirectory("skip_loose").toString
    (0L until 10L).toDF("id").write.parquet(s"$loose/p")
    val foreign = spark.read.parquet(s"$loose/p").filter($"id" === 3L)
    assert(foreign.count() == 1)
  }

  test("a new commit changes the file-set tag and the rule stands down") {
    val t = clustered()
    CowSkipApi.enable(spark)
    val staleDf = CowTable.read(spark, t) // registered for THIS manifest
    CowTable.mergeInto(spark, t,
      Seq((26L, 1L, 0.0, "x")).toDF("id", "band", "v", "s"), Seq("id"))
    // the stale DataFrame's file set no longer matches a registration
    // only if the catalog entry was replaced — either way the answer is
    // from the PINNED snapshot and stays correct
    assert(staleDf.filter($"id" === 26L).select("s").head().getString(0)
      == "s26")
    // the fresh read prunes against the NEW manifest
    val fresh = CowTable.read(spark, t).filter($"id" === 26L)
    assert(fresh.head().getString(3) == "x")
    assert(dataScanPaths(fresh).size <= 2, s"got ${dataScanPaths(fresh)}")
  }
}
