package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Migration regression: a pre-v3 base whose manifest carries `dv:` lines
  * with NO matching sidecar rows (the legacy entry-less form older builds
  * wrote). The v3 commit derives nData = sidecar entry count − dvs.size;
  * without dv-row canonicalization the first v3 commit over such a base
  * undercounts nData — in the worst case to zero, making readSnapshot
  * return EMPTY on a live table and mergeInto insert duplicates of live
  * keys. These specs forge exactly that legacy state (the format strings
  * below mirror the stable v2.2 manifest text format) and pin the
  * arithmetic and the reads after migration. */
class CowLegacyDvMigrationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_cow_legacy").resolve("t").toString

  /** Rewrite manifest v`v` of `table` as a v2.2 TEXT manifest whose
    * entries sidecar contains ONLY the data rows — the dv line rides in
    * the manifest text with no sidecar row, the legacy shape. */
  private def forgeLegacyV22(table: String, v: Int): Unit = {
    val m = CowTable.latestManifest(table).get
    assert(m.version == v && m.dvs.nonEmpty && m.entriesRel.isDefined)
    val mDir = Paths.get(table, "manifest")
    val legacyRel = s"files/legacy-v$v"
    val cols = Seq("kind", "path", "bytes", "numRows", "stats", "part")
    spark.read.parquet(mDir.resolve(m.entriesRel.get).toString)
      .filter(col("kind") === "data")
      .select(cols.map(col): _*)
      .coalesce(1).write.mode("overwrite")
      .parquet(mDir.resolve(legacyRel).toString)
    val nData = m.nData
    val text = (Seq(
      "graft-cow-manifest-v2.2",
      "schema:" + m.schemaJson.get,
      "entries:" + legacyRel,
      "nentries:" + nData) ++
      m.files ++                       // v2 manifests list data files
      m.dvs.map("dv:" + _) ++          // entry-less legacy dv lines
      Seq("end")).mkString("\n")
    Files.write(mDir.resolve(s"v$v.manifest"), text.getBytes("UTF-8"))
  }

  test("first v3 commit over a legacy entry-less-dv base keeps nData exact") {
    val t = freshTable()
    val df = (0L until 100L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "v").repartitionByRange(4, col("id"))
    CowTable.init(df, t)
    CowTable.deleteWhere(spark, t, col("id") < 10) // v1: one DV
    forgeLegacyV22(t, 1)

    val legacy = CowTable.latestManifest(t).get
    assert(legacy.filesLoader.isEmpty, "forged manifest must parse as pre-v3")
    assert(legacy.nData == 4 && legacy.dvs.size == 1)
    assert(CowTable.read(spark, t).count() == 90)

    // the first v3 commit: insert-only merge adds one data file; the
    // carried legacy sidecar has no dv row, the canonical rebuild adds it
    CowTable.mergeInto(spark, t,
      Seq((200L, "new", 42.0)).toDF("id", "name", "v"), Seq("id"))
    val m2 = CowTable.latestManifest(t).get
    assert(m2.filesLoader.isDefined, "commit over a legacy base must write v3")
    assert(m2.dvs.size == 1)
    assert(m2.nData == 5, s"nData undercount after migration: ${m2.nData}")
    assert(CowTable.read(spark, t).count() == 91)

    // live-key merge on the migrated table must update, not duplicate
    CowTable.mergeInto(spark, t,
      Seq((50L, "upd", -1.0)).toDF("id", "name", "v"), Seq("id"))
    val got = CowTable.read(spark, t)
    assert(got.count() == 91)
    assert(got.filter(col("id") === 50L).as[(Long, String, Double)]
      .collect().toSeq == Seq((50L, "upd", -1.0)))
  }

  test("migration commit cannot drive nData to zero on a live single-file table") {
    val t = freshTable()
    val df = (0L until 10L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "v").repartition(1)
    CowTable.init(df, t)
    CowTable.deleteWhere(spark, t, col("id") < 2) // v1: one DV, 8 rows live
    forgeLegacyV22(t, 1)
    assert(CowTable.read(spark, t).count() == 8)

    // first v3 commit adds a SECOND dv and no data file: without the
    // canonical dv rebuild the sidecar would hold 1 data + 1 fresh dv
    // row, nData = 2 − 2 = 0, and this read would come back EMPTY
    CowTable.deleteWhere(spark, t, col("id") < 4)
    val m2 = CowTable.latestManifest(t).get
    assert(m2.dvs.size == 2)
    assert(m2.nData == 1, s"nData must stay exact, got ${m2.nData}")
    assert(CowTable.read(spark, t).count() == 6)
  }
}
