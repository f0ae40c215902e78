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
        avg(col("l_quantity")).as("avg_qty"),
        max(col("l_extendedprice")).as("max_price"),
        count(col("l_extendedprice")).as("cnt_price"),
        count(lit(1)).as("cnt_rows"))
    assert(scanPaths(base).exists(_.contains("lineitem.parquet")))
    val want = sortedRows(base)

    val rewritten = MatView.mvRewrite(spark, dir)
    val paths = scanPaths(rewritten)
    assert(paths.nonEmpty && paths.forall(_.contains("graft_mv")),
      s"expected an MV-only scan, got $paths")
    assert(sortedRows(rewritten) == want)
    // the rewrite is born after the optimizer's pruning batch, so it must
    // prune the MV scan itself: unused sidecar columns stay unread
    val exec = rewritten.queryExecution.executedPlan.toString
    assert(!exec.contains("min_l_quantity") && !exec.contains("sum_l_extendedprice"),
      s"MV scan reads unused columns:\n$exec")
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
      // avg/count of a NON-measure column
      "avg non-measure" -> li.groupBy("l_returnflag")
        .agg(avg("l_discount").as("a")),
      "count non-measure" -> li.groupBy("l_returnflag")
        .agg(count(col("l_discount")).as("c")),
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

  test("avg with planted NULLs uses the non-null denominator") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mv_nulls").toString
    val basePath = s"$root/base"; val mvP = s"$root/mv"
    Seq(("a", Some(10.0)), ("a", None), ("a", Some(20.0)), ("b", None))
      .toDF("k", "x").write.parquet(basePath)
    MvCatalog.buildMv(spark.read.parquet(basePath), Seq("k"), Seq("x"), mvP)
    MvCatalog.register(spark, "nulls", basePath, Seq("k"), Seq("x"), mvP)
    MvRewriteApi.enable(spark)
    val df = spark.read.parquet(basePath).groupBy("k")
      .agg(avg(col("x")).as("a"), count(col("x")).as("c"),
        count(lit(1)).as("n"))
    assert(scanPaths(df).forall(_.contains("/mv")))
    val got = df.collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), r.getLong(2), r.getLong(3))))
      .toMap
    // avg ignores NULLs: 15.0 over 2 non-null of 3 rows; all-NULL -> null avg
    assert(got("a") == ((Some(15.0), 2L, 3L)))
    assert(got("b") == ((None, 0L, 1L)))
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

  test("regenerated base data triggers an MV rebuild (fingerprint staleness)") {
    import spark.implicits._
    // a private "dataset dir" we can regenerate, same path both times
    val root = java.nio.file.Files.createTempDirectory("graft_mv_regen").toString
    def writeBase(rows: Seq[(String, String, Double, Double)]): Unit =
      rows.toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$root/lineitem.parquet")
    writeBase(Seq(("A", "F", 1.0, 10.0), ("A", "F", 2.0, 20.0)))
    MvCatalog.clear()
    MatView.ensureLineitemMv(spark, root)
    def servedSum(): Double = {
      val df = spark.read.parquet(s"$root/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("s"))
      assert(scanPaths(df).forall(_.contains("graft_mv")),
        "rewrite not serving from the MV")
      df.collect().map(_.getDouble(2)).sum
    }
    assert(servedSum() == 3.0)
    // regenerate the dataset at the SAME dir path — without the data
    // fingerprint the tmpdir-cached MV would silently serve 3.0 forever
    writeBase(Seq(("A", "F", 5.0, 10.0), ("A", "F", 7.0, 20.0)))
    MvCatalog.clear()
    MatView.ensureLineitemMv(spark, root)
    assert(servedSum() == 12.0, "stale MV served after base regeneration")
  }

  test("buildMv under a live same-base registration reads the BASE, not itself") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mv_rebuild").toString
    val basePath = s"$root/base"; val mvP = s"$root/mv"
    def writeBase(rows: Seq[(String, Double)]): Unit =
      rows.toDF("k", "x").write.mode("overwrite").parquet(basePath)
    writeBase(Seq(("a", 1.0), ("a", 2.0)))
    MvCatalog.clear()
    MvCatalog.buildMv(spark.read.parquet(basePath), Seq("k"), Seq("x"), mvP)
    MvCatalog.register(spark, "rebuild", basePath, Seq("k"), Seq("x"), mvP)
    MvRewriteApi.enable(spark)
    // base changes; REBUILD while the registration is still live. If the
    // rule rewrote the build's own aggregate it would scan mvPath while
    // overwriting it — crash, or a silently-reproduced stale summary.
    writeBase(Seq(("a", 10.0), ("a", 20.0)))
    MvCatalog.buildMv(spark.read.parquet(basePath), Seq("k"), Seq("x"), mvP)
    val sums = spark.read.parquet(mvP).collect()
      .map(r => r.getString(r.fieldIndex("k")) ->
        r.getDouble(r.fieldIndex("sum_x"))).toMap
    assert(sums == Map("a" -> 30.0), s"rebuild produced stale MV: $sums")
    MvCatalog.clear()
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
