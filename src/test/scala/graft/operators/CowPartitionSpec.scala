package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Partitioned CoW tables: Iceberg-style entry-level partition tuples
  * (Hive-style dirs, columns kept in the files), exact partition
  * pruning composed with stats skipping, merge preserving the
  * discipline, DVs and the change feed surviving, and the metadata-only
  * partition listing. */
class CowPartitionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cow_part/" +
      java.util.UUID.randomUUID().toString.take(8)

  /** 100 rows over 4 regions, ids clustered within region. */
  private def fixture(): String = {
    val t = freshTable()
    val df = (0L until 100L).map { i =>
      (i, s"r${(i / 25).toInt}", i * 2, s"p$i")
    }.toDF("id", "region", "v", "name")
    CowTable.initPartitioned(df, t, Seq("region"))
    t
  }

  test("partition predicate prunes to the partition's files, both APIs agree") {
    val t = fixture()
    val m = CowTable.latestManifest(t).get
    assert(m.partitionCols == Seq("region"))
    // every file is single-valued on region and records its tuple
    val parts = CowTable.entriesDF(spark, t, m)
      .filter($"kind" === "data").select("part").collect()
    assert(parts.nonEmpty && parts.forall(!_.isNullAt(0)))
    val planned = CowTable.pruneDataFiles(spark, t, m, $"region" === "r2")
    assert(planned.nonEmpty && planned.size < m.files.size)
    assert(planned.forall(_.contains("__p_region=r2")))
    // an EXPRESSION on the partition column stats cannot decide
    val exprPlanned = CowTable.pruneDataFiles(spark, t, m,
      upper($"region") === "R2" && length($"region") === 2)
    assert(exprPlanned.toSet == planned.toSet,
      "expression-on-partition-column must prune exactly like equality")
    // composed with stats: region r2 holds ids [50,75)
    val both = CowTable.pruneDataFiles(spark, t, m,
      $"region" === "r2" && $"id" === 55L)
    assert(both.size <= planned.size)
    // results identical to the unpruned read
    val want = CowTable.read(spark, t)
      .filter(upper($"region") === "R2").count()
    assert(CowTable.readWhere(spark, t, upper($"region") === "R2")
      .count() == want)
  }

  test("merge preserves partition discipline; DVs and CDF survive") {
    val t = fixture()
    // update ids 10..14 (region r0), insert 225..229 (region r9)
    val src = ((10L to 14L) ++ (225L to 229L)).map { i =>
      (i, s"r${(i / 25).toInt}", i * 100, s"new$i")
    }.toDF("id", "region", "v", "name")
    CowTable.mergeInto(spark, t, src, Seq("id"))
    val m1 = CowTable.latestManifest(t).get
    assert(m1.partitionCols == Seq("region"))
    // rewritten + inserted files carry partition tuples too
    val nullParts = CowTable.entriesDF(spark, t, m1)
      .filter($"kind" === "data" && $"part".isNull).count()
    assert(nullParts == 0, "merge output lost partition tuples")
    // new partition appears in pruning and listing
    val p9 = CowTable.pruneDataFiles(spark, t, m1, $"region" === "r9")
    assert(p9.nonEmpty && p9.forall(_.contains("__p_region=r9")))
    val listing = CowTable.partitions(spark, t)
      .orderBy("region").collect()
    assert(listing.map(_.getString(0)).toSeq ==
      Seq("r0", "r1", "r2", "r3", "r9"))
    assert(listing.map(_.getLong(2)).sum == 105L) // written rows, pre-DV
    // DV delete on one partition; reads stay partition-pruned + exact
    CowTable.deleteWhere(spark, t, $"region" === "r1" && $"id" % 2L === 0L)
    val r1 = CowTable.readWhere(spark, t, $"region" === "r1")
    assert(r1.count() == 13 && r1.select("region").distinct().count() == 1)
    // change feed v0 -> v2: 5 updates (pre+post), 5 inserts, 12 deletes
    val ch = CowTable.tableChanges(spark, t, 0, 2, Seq("id"))
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch == Map("update_preimage" -> 5L, "update_postimage" -> 5L,
      "insert" -> 5L, "delete" -> 12L), s"unexpected feed: $ch")
  }

  test("compaction preserves partition tuples and pruning") {
    val t = fixture()
    // second wave of small per-partition files via an insert-only merge
    val more = (100L until 140L).map(i =>
      (i, s"r${(i / 25).toInt}", i * 2, s"p$i")).toDF("id", "region", "v", "name")
    CowTable.mergeInto(spark, t, more, Seq("id"))
    val before = CowTable.latestManifest(t).get
    CowTable.compactTable(spark, t, targetBytes = 1L << 30)
    val m = CowTable.latestManifest(t).get
    assert(m.version == before.version + 1 &&
      m.files.size < before.files.size, "compaction did not shrink files")
    // every compacted file still carries its exact partition tuple
    assert(CowTable.entriesDF(spark, t, m)
      .filter($"kind" === "data" && $"part".isNull).count() == 0,
      "compaction lost partition tuples")
    val planned = CowTable.pruneDataFiles(spark, t, m, $"region" === "r5")
    assert(planned.nonEmpty && planned.size < m.files.size &&
      planned.forall(_.contains("__p_region=r5")))
    // content identical through the compaction
    val got = CowTable.read(spark, t).collect().map(_.toString).sorted
    val want = CowTable.readVersion(spark, t, before.version)
      .collect().map(_.toString).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("empty-string and null partition values never mis-prune") {
    // Spark's partitionBy writes BOTH '' and null as
    // __HIVE_DEFAULT_PARTITION__ (one shared dir, possibly mixing the
    // two), so the manifest's part value is UNKNOWN there — exact
    // evaluation must stand down for string partition columns and the
    // stats path must carry reads, metadata counts, and row-level COW.
    val t = freshTable()
    val df = Seq(
      (1L, Option("a"), 10L), (2L, Option("a"), 20L),
      (3L, Option(""), 30L), (4L, Option(""), 40L),
      (5L, Option.empty[String], 50L), (6L, Option.empty[String], 60L),
      (7L, Option("b"), 70L))
      .toDF("id", "cat", "v")
      .select($"id", $"cat".as("cat"), $"v")
    CowTable.initPartitioned(df, t, Seq("cat"))
    // reads distinguish '' from null exactly
    assert(CowTable.readWhere(spark, t, $"cat" === "").select("id")
      .collect().map(_.getLong(0)).toSet == Set(3L, 4L),
      "rows with cat='' must survive partition pruning")
    assert(CowTable.readWhere(spark, t, $"cat".isNull).select("id")
      .collect().map(_.getLong(0)).toSet == Set(5L, 6L))
    assert(CowTable.readWhere(spark, t, $"cat" === "a").count() == 2L)
    // metadata counts scan the mixed default-partition file, exactly
    assert(CowTable.countWhere(spark, t, $"cat".isNull) == 2L)
    assert(CowTable.countWhere(spark, t, $"cat" === "") == 2L)
    // group-COW DELETE must rewrite (not skip) the default-partition
    // file when targeting '' rows
    CowTable.deleteWhere(spark, t, $"cat" === "")
    val after = CowTable.read(spark, t)
    assert(after.count() == 5L)
    assert(after.filter($"cat".isNull).select("id")
      .collect().map(_.getLong(0)).toSet == Set(5L, 6L),
      "delete of cat='' must keep the null rows")
    assert(after.filter($"cat" === "").count() == 0L)
  }

  test("non-deterministic partition conjuncts never prune per file") {
    val t = fixture()
    val m = CowTable.latestManifest(t).get
    // one random draw per FILE would prune whole partitions off one
    // sample; the conjunct must fall back to the (keep-all) stats path
    val planned = CowTable.pruneDataFiles(spark, t, m,
      $"region" === concat(lit("r"),
        floor(rand() * 4).cast("int").cast("string")))
    assert(planned.size == m.files.size,
      "non-deterministic predicate must not be file-pruned")
  }

  test("vacuum reclaims replaced files under partitioned layouts") {
    val t = fixture()
    val m0 = CowTable.latestManifest(t).get
    // materialize the v0 file list BEFORE vacuum: a v3 manifest handle
    // serves its list from the entries sidecar, and retention that
    // drops the version drops the sidecar with it — the same contract
    // as time travel (a vacuumed version is not readable)
    val m0Files = m0.files
    // DV-delete most of r1, then materialize: r1's files are replaced
    // by rewritten ones under the partitioned subdir layout
    CowTable.deleteWhere(spark, t, $"region" === "r1" && $"id" < 49L)
    CowTable.rewriteDeletes(spark, t)
    val deleted = CowTable.vacuum(spark, t, keepVersions = 1)
    val replaced = m0Files.filter(_.contains("__p_region=r1"))
    assert(replaced.nonEmpty)
    replaced.foreach { f =>
      assert(deleted.contains(f),
        s"replaced partitioned file not reclaimed: $f")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(f)))
    }
    // live partitioned files survive, and the table still reads right
    assert(CowTable.read(spark, t).count() == 76L)
    assert(CowTable.readWhere(spark, t, $"region" === "r1").count() == 1L)
  }

  test("metadata count/min/max use exact partition values") {
    val t = fixture()
    val b = CowTable.countWhereDetailed(spark, t, $"region" === "r3")
    assert(b.total == 25L && b.partialFiles == 0 && b.scannedRows == 0L,
      s"partition count must be metadata-only: $b")
    val mn = CowTable.minWhereDetailed(spark, t, "id", $"region" === "r3")
    assert(mn.value.contains(75L) && mn.scannedFiles == 0)
    val mx = CowTable.maxWhereDetailed(spark, t, "id",
      length($"region") === 2L && $"region" > "r2")
    assert(mx.value.contains(99L))
  }
}
