package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.MatView

class MvRewriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  /** Root paths of every file scan in the OPTIMIZED plan (post-rewrite). */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("mv_rewrite scans ONLY the MV and matches the base-table answer") {
    // expected: computed with the catalog empty so the base table is read
    MvCatalog.clear()
    val base = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("cnt_rows"))
    assert(scanPaths(base).exists(_.contains("lineitem.parquet")))
    val want = sortedRows(base)

    val rewritten = MatView.mvRewrite(spark, dir)
    val paths = scanPaths(rewritten)
    assert(paths.nonEmpty && paths.forall(_.contains("graft_mv")),
      s"expected an MV-only scan, got $paths")
    assert(sortedRows(rewritten) == want)
  }

  test("subset-key rollup with key filter re-aggregates the MV") {
    MvCatalog.clear()
    val base = Tables.lineitem(spark, dir)
      .filter(col("l_linestatus") === "O")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        count(lit(1)).as("cnt_rows"))
    val want = sortedRows(base)

    val rewritten = MatView.mvRewriteRollup(spark, dir)
    val paths = scanPaths(rewritten)
    assert(paths.nonEmpty && paths.forall(_.contains("graft_mv")))
    assert(sortedRows(rewritten) == want)
  }

  test("out-of-shape aggregates are left on the base table") {
    MatView.ensureLineitemMv(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val shapes: Seq[(String, DataFrame)] = Seq(
      // filter on a MEASURE changes which rows aggregate — MV can't answer
      "measure filter" -> li.filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s")),
      // avg is not rewritten (only sum/min/max/count(*))
      "avg" -> li.groupBy("l_returnflag").agg(avg("l_quantity").as("a")),
      // count(col) differs from count(*) under NULLs — not rewritten
      "count(col)" -> li.groupBy("l_returnflag")
        .agg(count(col("l_quantity")).as("c")),
      // distinct aggregate
      "sum(distinct)" -> li.groupBy("l_returnflag")
        .agg(sum_distinct(col("l_quantity")).as("sd")),
      // aggregate over a computed child
      "computed child" -> li.groupBy("l_returnflag")
        .agg(sum(col("l_quantity") * 2).as("s2")),
      // grouping by a non-key column
      "non-key group" -> li.groupBy("l_shipdate")
        .agg(sum("l_quantity").as("s")),
    )
    for ((label, df) <- shapes) {
      val paths = scanPaths(df)
      assert(paths.exists(_.contains("lineitem.parquet")),
        s"$label: expected base scan, got $paths")
      assert(!paths.exists(_.contains("graft_mv")),
        s"$label: unexpected MV scan")
    }
  }

  test("global count(*) over an empty key-filter returns 0 via the MV") {
    MatView.ensureLineitemMv(spark, dir)
    val df = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "Z") // no such flag
      .agg(count(lit(1)).as("n"))
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains("graft_mv")))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("rewritten output exprIds stay referenceable downstream") {
    MatView.ensureLineitemMv(spark, dir)
    // filter + sort over the rewritten aggregate's outputs, then join
    // back to a dimension — would fail analysis/runtime if the rewrite
    // changed output attribute ids
    val agg = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt_rows"))
    val out = agg.filter(col("cnt_rows") > 0)
      .select(col("l_returnflag"), (col("sum_qty") / col("cnt_rows")).as("m"))
      .orderBy("l_returnflag", "m")
    assert(scanPaths(out).forall(_.contains("graft_mv")))
    assert(out.count() > 0)
  }

  test("registration refuses an MV with missing columns") {
    val bad = s"${System.getProperty("java.io.tmpdir")}/graft_mv_badshape"
    Tables.lineitem(spark, dir).groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt")).write.mode("overwrite").parquet(bad)
    val e = intercept[IllegalArgumentException] {
      MvCatalog.register(spark, "bad", s"$dir/lineitem.parquet",
        Seq("l_returnflag"), Seq("l_quantity"), bad)
    }
    assert(e.getMessage.contains("missing columns"))
    // failed registration must not have poisoned the catalog
    MatView.ensureLineitemMv(spark, dir)
    assert(scanPaths(MatView.mvRewrite(spark, dir)).forall(_.contains("graft_mv")))
  }
}
