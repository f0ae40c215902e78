package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.CowTable

/** DSv2 aggregate pushdown: an unfiltered ungrouped `COUNT(*)` on a
  * catalog cow table collapses to a one-row LocalTableScan whose value
  * is PROVEN from metadata (entry row counts minus live DV runs) —
  * no data file is opened. Everything that could make the metadata
  * count unsound refuses and scans: residual filters, GROUP BY, other
  * aggregates, row-level-operation scans. */
class CowCountPushSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")

  private def freshTable(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cow_cnt/" +
      java.util.UUID.randomUUID().toString.take(8)

  private def sqlTable(t: String): String = s"graft.`$t`"

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  test("bare COUNT(*) plans LocalTableScan and matches the DV-aware " +
      "read, across inserts and time travel") {
    val t = freshTable()
    CowTable.init((0L until 100L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(4), t)                                   // v0
    CowTable.deleteWhere(spark, t, $"id" % 10 === 3)        // v1: 10 DV'd
    CowTable.upsertMor(spark, t,
      (1000L until 1025L).map(i => (i, s"x$i")).toDF("id", "name"),
      Seq("id"))                                            // v2: +25
    val q = s"SELECT COUNT(*) AS c FROM ${sqlTable(t)}"
    val plan = planOf(q)
    assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"expected metadata-only plan, got:\n$plan")
    assert(spark.sql(q).head().getLong(0) == 115L)
    assert(CowTable.read(spark, t).count() == 115L)
    // VERSION AS OF pins the metadata count to the snapshot
    val q1 = s"SELECT COUNT(*) AS c FROM ${sqlTable(t)} VERSION AS OF 1"
    val p1 = planOf(q1)
    assert(p1.contains("LocalTableScan"), s"time travel should push:\n$p1")
    assert(spark.sql(q1).head().getLong(0) == 90L)
  }

  test("anything beyond the bare count scans: filter, group by, " +
      "count(col), avg") {
    val t = freshTable()
    CowTable.init((0L until 50L).map(i =>
        (i, i % 3, if (i % 5 == 0) None else Some(s"s$i")))
      .toDF("id", "g", "opt").repartition(2), t)
    CowTable.deleteWhere(spark, t, $"id" === 7L)
    for (q <- Seq(
        s"SELECT COUNT(*) FROM ${sqlTable(t)} WHERE id % 2 = 0",
        s"SELECT g, COUNT(*) FROM ${sqlTable(t)} GROUP BY g",
        // count of a NULLABLE column is not count(*) — must scan
        // (count of a non-nullable one is, and Spark itself rewrites
        // it to CountStar before it reaches the builder — that case
        // correctly pushes)
        s"SELECT COUNT(opt) FROM ${sqlTable(t)}",
        s"SELECT COUNT(*), AVG(id) FROM ${sqlTable(t)}")) {
      assert(!planOf(q).contains("LocalTableScan"), s"must scan: $q")
    }
    assert(spark.sql(s"SELECT COUNT(opt) AS c FROM ${sqlTable(t)}")
      .head().getLong(0) == 39L) // 10 NULLs, id 7 (non-null) deleted
    // and the scanned answers stay right (the deleted id 7 is odd, so
    // all 25 evens survive)
    assert(spark.sql(
      s"SELECT COUNT(*) AS c FROM ${sqlTable(t)} WHERE id % 2 = 0")
      .head().getLong(0) == 25L)
  }

  test("MIN/MAX push with COUNT in one statement; a delete moving the " +
      "extremum stays row-exact (the DV'd file is read, its stale stat " +
      "never wins)") {
    val t = freshTable()
    CowTable.init((0L until 60L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartitionByRange(3, $"id"), t)
    // kill the global max AND the global min — both live in full files
    // whose stats still claim them
    CowTable.deleteWhere(spark, t, $"id" === 59L || $"id" === 0L)
    val q = s"SELECT MIN(id) AS mn, MAX(id) AS mx, COUNT(*) AS c " +
      s"FROM ${sqlTable(t)}"
    val plan = planOf(q)
    assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"expected metadata-only plan, got:\n$plan")
    val r = spark.sql(q).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 58L, 58L)))
    // string min/max push too (stats cover strings)
    val qs = s"SELECT MAX(name) AS mx FROM ${sqlTable(t)}"
    assert(planOf(qs).contains("LocalTableScan"))
    assert(spark.sql(qs).head().getString(0) == "n9")
  }

  test("MIN/MAX refuse: stat-less columns (beyond the stats cap), " +
      "version-pinned reads, filters") {
    val t = freshTable()
    // 26 columns: the last is beyond MaxStatsCols (24) -> no stats
    val cols = (0 until 25).map(i => (col("id") * (i + 1)).as(s"c$i"))
    CowTable.init(spark.range(30)
      .select((col("id") +: cols): _*).repartition(2), t)
    CowTable.deleteWhere(spark, t, $"id" === 5L)
    assert(planOf(s"SELECT MIN(id) AS mn FROM ${sqlTable(t)}")
      .contains("LocalTableScan"))
    val qLate = s"SELECT MIN(c24) AS mn FROM ${sqlTable(t)}"
    assert(!planOf(qLate).contains("LocalTableScan"),
      "a column without per-file stats must scan")
    assert(spark.sql(qLate).head().getLong(0) == 0L)
    // a version-pinned MIN refuses (the machinery resolves LATEST);
    // a version-pinned bare COUNT still pushes
    val qv = s"SELECT MIN(id) AS mn FROM ${sqlTable(t)} VERSION AS OF 0"
    assert(!planOf(qv).contains("LocalTableScan"))
    assert(spark.sql(qv).head().getLong(0) == 0L)
    assert(planOf(s"SELECT COUNT(*) AS c FROM ${sqlTable(t)} " +
      "VERSION AS OF 0").contains("LocalTableScan"))
    assert(!planOf(s"SELECT MIN(id) AS mn FROM ${sqlTable(t)} " +
      "WHERE id > 3").contains("LocalTableScan"))
  }

  test("the metadata count survives schema evolution and partial-column " +
      "upserts; an emptied table pushes 0") {
    val t = freshTable()
    CowTable.init((0L until 40L).map(i => (i, i * 2.0)).toDF("id", "v")
      .repartition(2), t)
    CowTable.alterTable(spark, t,
      renames = Map("v" -> "w"),
      adds = Seq(("note", org.apache.spark.sql.types.StringType)))
    CowTable.upsertMor(spark, t,
      (100L until 110L).map(i => (i, s"n$i")).toDF("id", "note"),
      Seq("id"), preserveMissing = true)
    val q = s"SELECT COUNT(*) AS c FROM ${sqlTable(t)}"
    assert(planOf(q).contains("LocalTableScan"))
    assert(spark.sql(q).head().getLong(0) == 50L)
    CowTable.deleteWhere(spark, t, lit(true))
    assert(planOf(q).contains("LocalTableScan"))
    assert(spark.sql(q).head().getLong(0) == 0L)
  }
}
