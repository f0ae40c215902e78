package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Branch refs + write-audit-publish ([[CowTable.createBranch]] /
  * [[CowTable.publishBranch]] / [[CowTable.dropBranch]]): a branch
  * forks metadata-only, takes every existing committer unchanged,
  * stays invisible to parent readers, publishes as ONE atomic parent
  * version (fast-forward-only), and drops without trace. */
class CowBranchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cow_branch/" +
      java.util.UUID.randomUUID().toString.take(8)

  private def fixture(): String = {
    val t = freshTable()
    CowTable.init((0L until 100L).map(i => (i, s"n$i", i * 2.0))
      .toDF("id", "name", "v").repartition(4), t)
    t
  }

  private def rows(t: String): Map[Long, (String, Double)] =
    CowTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("fork is metadata-only; branch writes are invisible to the parent") {
    val t = fixture()
    val m0 = CowTable.latestManifest(t).get
    val bp = CowTable.createBranch(spark, t, "stage")
    val bm = CowTable.latestManifest(bp).get
    assert(bm.files == m0.files, "fork must carry files BY REFERENCE")
    assert(bm.schemaJson == m0.schemaJson)
    assert(CowTable.listBranches(t) == Seq("stage"))
    // a full committer works on the branch unchanged
    CowTable.mergeInto(spark, bp,
      Seq((5L, "upd5", 50.0), (200L, "new200", 2.0))
        .toDF("id", "name", "v"), Seq("id"))
    CowTable.deleteWhere(spark, bp, col("id") === 7L)
    val b = rows(bp)
    assert(b(5L) == ("upd5", 50.0) && b(200L) == ("new200", 2.0) &&
      !b.contains(7L) && b.size == 100)
    // parent untouched — same manifest version, same rows
    assert(CowTable.latestManifest(t).get.version == m0.version)
    val p = rows(t)
    assert(p(5L) == ("n5", 10.0) && !p.contains(200L) && p.size == 100)
  }

  test("publish adopts the branch head as ONE atomic parent version") {
    val t = fixture()
    val v0 = CowTable.latestManifest(t).get.version
    val bp = CowTable.createBranch(spark, t, "stage")
    CowTable.mergeInto(spark, bp,
      Seq((1L, "u1", -1.0), (300L, "i300", 3.0)).toDF("id", "name", "v"),
      Seq("id"))
    val pm = CowTable.publishBranch(spark, t, "stage")
    assert(pm.version == v0 + 1, "publish must be exactly one version")
    val p = rows(t)
    assert(p(1L) == ("u1", -1.0) && p(300L) == ("i300", 3.0) &&
      p.size == 101)
    CowTable.dropBranch(spark, t, "stage")
    assert(CowTable.listBranches(t).isEmpty)
    // parent still reads fine after the drop (published files are
    // branch-resident data dirs — the drop must not delete them)
    assert(rows(t).size == 101)
  }

  test("publish is fast-forward-only: a moved parent refuses") {
    val t = fixture()
    val bp = CowTable.createBranch(spark, t, "stale")
    CowTable.mergeInto(spark, bp,
      Seq((1L, "b1", 1.0)).toDF("id", "name", "v"), Seq("id"))
    // parent advances independently
    CowTable.mergeInto(spark, t,
      Seq((2L, "p2", 2.0)).toDF("id", "name", "v"), Seq("id"))
    intercept[java.util.ConcurrentModificationException] {
      CowTable.publishBranch(spark, t, "stale")
    }
    // the parent's own write survives; the branch's never landed
    val p = rows(t)
    assert(p(2L) == ("p2", 2.0) && p(1L) == ("n1", 2.0))
    CowTable.dropBranch(spark, t, "stale")
  }

  test("drop rejects a bad batch without trace; audit runs on the branch") {
    val t = fixture()
    val sig0 = CowTable.read(spark, t)
      .agg(count(lit(1)), sum($"v")).head()
    val bp = CowTable.createBranch(spark, t, "bad")
    CowTable.mergeInto(spark, bp,
      (0L until 50L).map(i => (i, s"bad$i", -1.0)).toDF("id", "name", "v"),
      Seq("id"))
    val audit = DataQuality.audit(CowTable.read(spark, bp),
      Seq(DataQuality.DqInRange("v", 0.0, 1e6)))
    assert(audit.select("violations").head().getLong(0) === 50L)
    CowTable.dropBranch(spark, t, "bad")
    val sig1 = CowTable.read(spark, t)
      .agg(count(lit(1)), sum($"v")).head()
    assert(sig0 == sig1, "parent changed across a rejected batch")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(CowTable.branchPath(t, "bad"))))
  }

  test("vacuum refuses while branches exist; published branch files survive the drop sweep") {
    val t = fixture()
    CowTable.declareBloom(spark, t,
      Map("id" -> CowTable.BloomColSpec(0.01, 1000L)))
    val bp = CowTable.createBranch(spark, t, "stage")
    // the fork carried the bloom declaration + sidecar by absolute rel:
    // branch-side pruning serves (the fixture is 4 ranged files; an
    // equality probe keeps <= all of them and readWhere stays exact)
    assert(CowTable.latestManifest(bp).get.bloomCols.contains("id"))
    assert(CowTable.readWhere(spark, bp, col("id") === 5L).count() === 1L)
    val e = intercept[IllegalArgumentException] {
      CowTable.vacuum(spark, t)
    }
    assert(e.getMessage.contains("branches"))
    // a branch commit writes data files + bloom sidecars under the
    // BRANCH dir; publish carries them by path, so the drop's sweep
    // must KEEP exactly what parent manifests reference — reads and
    // the bloom index keep serving from the dormant dir
    CowTable.mergeInto(spark, bp,
      Seq((500L, "x", 1.0)).toDF("id", "name", "v"), Seq("id"))
    CowTable.publishBranch(spark, t, "stage")
    CowTable.dropBranch(spark, t, "stage")
    assert(CowTable.listBranches(t).isEmpty,
      "the branch's manifest chain must be gone")
    assert(CowTable.readWhere(spark, t, col("id") === 500L).count() === 1L)
    assert(CowTable.read(spark, t).count() === 101L)
    assert(CowTable.latestManifest(t).get.bloomCols.contains("id"))
    CowTable.vacuum(spark, t) // branches gone — allowed again
    assert(CowTable.read(spark, t).count() === 101L,
      "vacuum's branch re-sweep must keep referenced files")
    // consolidation + compaction migrate everything parent-local;
    // the next vacuum's re-sweep then reclaims the dormant dir's
    // remaining sidecar (data files may stay until their manifest
    // generation drops — sweep is reference-exact, never eager)
    CowTable.consolidateBlooms(spark, t)
    CowTable.compactTable(spark, t, 1L << 26)
    CowTable.vacuum(spark, t)
    assert(CowTable.read(spark, t).count() === 101L)
    assert(CowTable.readWhere(spark, t, col("id") === 500L).count() === 1L)
  }

  test("SQL CALL surface drives the whole WAP loop") {
    val t = fixture()
    spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    spark.sql(s"CALL graft.cow_create_branch(table => '$t', " +
      "name => 'sqlstage')").collect()
    val bp = CowTable.branchPath(t, "sqlstage")
    // branch is itself addressable through the catalog
    Seq((999L, "sql999", 9.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("wap_src")
    spark.sql(s"CALL graft.cow_merge(table => '$bp', " +
      "source => 'wap_src', keys => 'id')").collect()
    assert(spark.sql(s"SELECT count(*) FROM graft.`$bp`")
      .head().getLong(0) === 101L)
    assert(CowTable.read(spark, t).count() === 100L)
    spark.sql(s"CALL graft.cow_publish_branch(table => '$t', " +
      "name => 'sqlstage')").collect()
    assert(CowTable.read(spark, t).count() === 101L)
    spark.sql(s"CALL graft.cow_drop_branch(table => '$t', " +
      "name => 'sqlstage')").collect()
    assert(CowTable.listBranches(t).isEmpty)
  }

  test("half-created branch (crash between base record and v0 commit) " +
      "is invisible and recoverable; a missing base fails publish loudly") {
    val t = fixture()
    // simulate the crash window: createBranch writes parent-base FIRST,
    // then commits v0 — a crash in between leaves only the base record
    val bp = CowTable.branchPath(t, "crashy")
    val base = java.nio.file.Paths.get(bp, "manifest", "parent-base")
    java.nio.file.Files.createDirectories(base.getParent)
    java.nio.file.Files.write(base, "0".getBytes("UTF-8"))
    assert(CowTable.listBranches(t).isEmpty,
      "a base record without a manifest must not be a listable branch")
    // the parent's vacuum is not blocked by the debris
    CowTable.mergeInto(spark, t,
      Seq((1L, "u1", 1.0)).toDF("id", "name", "v"), Seq("id"))
    CowTable.vacuum(spark, t)
    // a retry of the fork simply overwrites the stale base and lands
    val bp2 = CowTable.createBranch(spark, t, "crashy")
    assert(bp2 == bp && CowTable.listBranches(t) == Seq("crashy"))
    CowTable.publishBranch(spark, t, "crashy") // base is fresh — works
    CowTable.dropBranch(spark, t, "crashy")
    // inverse corruption: a manifest without its base record must fail
    // publish with a diagnosis, not a raw NoSuchFileException
    val bp3 = CowTable.createBranch(spark, t, "nobase")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(bp3, "manifest", "parent-base"))
    val e = intercept[IllegalArgumentException] {
      CowTable.publishBranch(spark, t, "nobase")
    }
    assert(e.getMessage.contains("parent-base record is missing"))
    CowTable.dropBranch(spark, t, "nobase")
  }
}
