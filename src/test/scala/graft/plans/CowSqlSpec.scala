package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.CowTable

/** `FROM cow_read('/path'[, version])` — the lakehouse snapshot as a
  * SQL table function. */
class CowSqlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private def freshTable(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cow_sql/" +
      java.util.UUID.randomUUID().toString.take(8)

  test("cow_read serves the DV-applied latest snapshot and time travel") {
    val t = freshTable()
    CowTable.init((0L until 30L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartitionByRange(3, $"id"), t)
    CowTable.mergeInto(spark, t, Seq((5L, "upd")).toDF("id", "name"),
      Seq("id"))
    CowTable.deleteWhere(spark, t, $"id" === 7L)
    val got = spark.sql(s"SELECT id, name FROM cow_read('$t') ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 29 && !got.exists(_._1 == 7L))
    assert(got.find(_._1 == 5L).get._2 == "upd")
    // time travel to v0
    val v0 = spark.sql(s"SELECT COUNT(*) AS n, " +
      s"SUM(CASE WHEN name = 'n5' THEN 1 ELSE 0 END) AS orig " +
      s"FROM cow_read('$t', 0)").head()
    assert(v0.getLong(0) == 30L && v0.getLong(1) == 1L)
    // joins/aggregates over the TVF resolve normally
    val agg = spark.sql(
      s"SELECT COUNT(*) AS n FROM cow_read('$t') a JOIN cow_read('$t', 0) b" +
        s" ON a.id = b.id WHERE a.id < 10").head()
    assert(agg.getLong(0) == 9L) // id 7 deleted from the latest side
  }

  test("a WHERE over the TVF prunes files at DSv2 scan planning") {
    val t = freshTable()
    val df = (0L until 100L).map(i => (i, s"n$i", (i / 25 + 1).toInt))
      .toDF("id", "name", "__f")
    CowTable.initFiled(df, t, "__f", 4)
    val q = spark.sql(s"SELECT id FROM cow_read('$t') WHERE id BETWEEN 30 AND 40")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (30L to 40L))
    // the TVF resolves to the SAME DSv2 scan the catalog read uses, so
    // pushed filters prune files through the manifest stats at planning
    val planned = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan
    }.collect { case s: CowBatchScan => s.plannedFiles.size }.sum
    assert(planned == 1, s"TVF scan not pruned: $planned files")
    // metadata columns resolve through the TVF (maintenance queries)
    val files = spark.sql(
      s"SELECT COUNT(DISTINCT _file) AS nf FROM cow_read('$t')").head()
    assert(files.getLong(0) == 4L)
  }

  test("CALL procedures drive the write lifecycle from SQL") {
    spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    val t = freshTable()
    CowTable.init((0L until 100L).map(i => (i, s"n$i", i * 2))
      .toDF("id", "name", "v").repartitionByRange(4, $"id"), t)
    (50L until 120L).map(i => (i, s"u$i", i * 10)).toDF("id", "name", "v")
      .createOrReplaceTempView("cow_proc_src")
    // merge: update 50..99 (delete those with id%10=7), insert 100..119
    val m = spark.sql(s"CALL graft.cow_merge(table => '$t', " +
      "source => 'cow_proc_src', keys => 'id', " +
      "delete_cond => 'id % 10 = 7')").head()
    assert(m.getInt(0) == 1, s"unexpected CALL summary: $m")
    // delete via DV, then compact, then vacuum — all SQL
    spark.sql(s"CALL graft.cow_delete(table => '$t', cond => 'id < 5')")
      .collect()
    val afterDelete = CowTable.latestManifest(t).get
    assert(afterDelete.version == 2 && afterDelete.dvs.nonEmpty)
    spark.sql(s"CALL graft.cow_compact(table => '$t', " +
      "target_bytes => 10000000)").collect()
    spark.sql(s"CALL graft.cow_vacuum(table => '$t', keep_versions => 1)")
      .collect()
    // final state equals the same lifecycle's relational form
    val got = spark.sql(s"SELECT id, name, v FROM cow_read('$t')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val want = ((0L until 50L).map(i => (i, s"n$i", i * 2)) ++
      (50L until 120L).map(i => (i, s"u$i", i * 10)))
      .filterNot { case (i, _, _) =>
        // delete_cond applies to MATCHED rows only (unmatched insert)
        (i >= 50 && i < 100 && i % 10 == 7) || i < 5 }
    assert(got.toSeq == want.sortBy(_._1),
      s"SQL lifecycle diverged: got ${got.length}, want ${want.length}")
    // SHOW PROCEDURES lists the surface
    val procs = spark.sql("SHOW PROCEDURES IN graft").collect()
      .map(_.getString(3)).toSet
    assert(procs == Set("cow_merge", "cow_delete", "cow_compact",
      "cow_vacuum", "cow_maintain", "cow_expire", "cow_declare_bloom",
      "cow_create_branch", "cow_publish_branch", "cow_drop_branch"))
    // unknown procedure fails with the known list
    val err = intercept[Exception](
      spark.sql(s"CALL graft.cow_nope(table => '$t')"))
    assert(err.getMessage.contains("cow_nope")) // FAILED_TO_LOAD_ROUTINE
  }

  test("CALL cow_maintain runs the selective-rewrite/compact/vacuum policy") {
    spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    val t = freshTable()
    CowTable.init((0L until 100L).map(i => (i, s"n$i", i * 2))
      .toDF("id", "name", "v").repartitionByRange(4, $"id"), t)
    // one dead-heavy file, one lightly-touched file
    CowTable.deleteWhere(spark, t, $"id" < 15L)
    CowTable.deleteWhere(spark, t, $"id" === 30L)
    // threshold-only pass (no compaction): heavy file rewrites, light
    // file keeps its DV in the consolidated sidecar
    spark.sql(s"CALL graft.cow_maintain(table => '$t', " +
      "dead_threshold => 0.3D)").collect()
    val mid = CowTable.latestManifest(t).get
    assert(mid.dvs.nonEmpty, "light file's delete must survive as a DV")
    // full policy: compaction materializes the kept DV, vacuum prunes
    val sum = spark.sql(s"CALL graft.cow_maintain(table => '$t', " +
      "dead_threshold => 0.3D, target_bytes => 16777216, " +
      "keep_versions => 1)").head()
    val fin = CowTable.latestManifest(t).get
    assert(fin.dvs.isEmpty && sum.getInt(0) == fin.version)
    val got = spark.sql(s"SELECT id FROM cow_read('$t')")
      .as[Long].collect().sorted.toSeq
    assert(got == (15L until 100L).filterNot(_ == 30L))
  }

  test("bad arguments are refused with usage") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM cow_read(42)").collect()
    }
    assert(e.getMessage.contains("table_path") ||
      e.getMessage.contains("cow_read"))
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM cow_read('/nonexistent_cow_table')")
        .collect()
    }
    assert(e2.getMessage.contains("does not exist") ||
      e2.getMessage.contains("cow"))
  }
}
