package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Changelog, CowTable}

/** CDC → lakehouse ingestion: each micro-batch of changelog rows is
  * compacted to latest-wins-per-key and MERGEd into the copy-on-write
  * table (upserts replace, tombstones delete, new keys insert) — the
  * Delta-style `foreachBatch MERGE INTO` loop. The table's final
  * content must equal the full-history batch compaction exactly, and
  * every batch commits one table version with untouched files carried
  * by reference. */
class StreamingCowMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("foreachBatch MERGE loop converges to the full-history compaction") {
    import spark.implicits._
    val history = (1L to 300L).map(i =>
      (i % 20, i, if (i % 13 == 0) "d" else "u", i * 1.5))
    val table = java.nio.file.Files
      .createTempDirectory("cow_stream").resolve("t").toString
    val input = MemoryStream[(Long, Long, String, Double)](spark)
    val q = input.toDF().toDF("k", "v", "op", "payload").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // latest-wins within the batch (merge requires unique source keys)
        val latest = batch
          .withColumn("__r", row_number().over(
            Window.partitionBy("k").orderBy(col("v").desc)))
          .filter(col("__r") === 1).drop("__r")
        if (CowTable.latestManifest(table).isEmpty) {
          // bootstrap: first batch's live rows become version 0
          CowTable.init(latest.filter(col("op") =!= "d").drop("op"), table)
        } else {
          CowTable.mergeInto(spark, table, latest,
            Seq("k"), deleteCond = Some(col("op") === "d"), insert = true)
        }
        () // foreachBatch wants Unit
      }
      .start()
    try {
      history.grouped(60).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
    } finally q.stop()

    val stored = CowTable.read(spark, table)
      .select($"k", $"v", $"payload").as[(Long, Long, Double)].collect().toSet
    val ref = Changelog.compact(history.toDF("k", "v", "op", "payload"),
      Seq("k"), Seq(col("v")), col("op") === "d", Seq("v", "payload"))
      .select($"k", $"v", $"payload").as[(Long, Long, Double)].collect().toSet
    assert(stored == ref && stored.nonEmpty)
    // one version per batch: bootstrap + four merges
    assert(CowTable.latestManifest(table).get.version == 4)
  }

  test("upsert-merge + DV-delete loop: tombstones never rewrite data files") {
    import spark.implicits._
    val history = (1L to 300L).map(i =>
      (i % 20, i, if (i % 13 == 0) "d" else "u", i * 1.5))
    val table = java.nio.file.Files
      .createTempDirectory("cow_stream_dv").resolve("t").toString
    var dvDeletes = 0
    val input = MemoryStream[(Long, Long, String, Double)](spark)
    val q = input.toDF().toDF("k", "v", "op", "payload").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val latest = batch
          .withColumn("__r", row_number().over(
            Window.partitionBy("k").orderBy(col("v").desc)))
          .filter(col("__r") === 1).drop("__r")
        val ups = latest.filter(col("op") =!= "d").drop("op")
        if (CowTable.latestManifest(table).isEmpty) {
          CowTable.init(ups, table)
        } else if (!ups.isEmpty) {
          CowTable.mergeInto(spark, table, ups, Seq("k"), insert = true)
        }
        // tombstoned keys leave as a deletion vector, not a rewrite —
        // the steady-state file churn of the loop is upserts only
        val delKeys = latest.filter(col("op") === "d")
          .select("k").as[Long].collect().toSeq
        if (delKeys.nonEmpty && CowTable.latestManifest(table).isDefined) {
          val before = CowTable.latestManifest(table).get
          val m = CowTable.deleteWhere(spark, table,
            col("k").isInCollection(delKeys))
          if (m.version != before.version) {
            assert(m.files == before.files,
              "a DV delete changed the data file set")
            dvDeletes += 1
          }
        }
        ()
      }
      .start()
    try {
      history.grouped(60).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
    } finally q.stop()

    def content = CowTable.read(spark, table)
      .select($"k", $"v", $"payload").as[(Long, Long, Double)].collect().toSet
    val ref = Changelog.compact(history.toDF("k", "v", "op", "payload"),
      Seq("k"), Seq(col("v")), col("op") === "d", Seq("v", "payload"))
      .select($"k", $"v", $"payload").as[(Long, Long, Double)].collect().toSet
    assert(content == ref && ref.nonEmpty)
    assert(dvDeletes > 0, "history never exercised a cross-batch DV delete")
    // end-of-stream maintenance: materialize, content unchanged, DVs gone
    val m = CowTable.rewriteDeletes(spark, table)
    assert(m.dvs.isEmpty)
    assert(content == ref)
  }

  test("merge-on-read SQL MERGE loop: one statement per batch, no rewrites") {
    import spark.implicits._
    val history = (1L to 300L).map(i =>
      (i % 20, i, if (i % 13 == 0) "d" else "u", i * 1.5))
    val table = java.nio.file.Files
      .createTempDirectory("cow_stream_mor").resolve("t").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    spark.conf.set(graft.plans.CowDsv2.MorModeConf, "mor")
    var merges = 0
    try {
      val input = MemoryStream[(Long, Long, String, Double)](spark)
      val q = input.toDF().toDF("k", "v", "op", "payload").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val latest = batch
            .withColumn("__r", row_number().over(
              Window.partitionBy("k").orderBy(col("v").desc)))
            .filter(col("__r") === 1).drop("__r")
          if (CowTable.latestManifest(table).isEmpty) {
            CowTable.init(latest.filter(col("op") =!= "d").drop("op"), table)
          } else {
            // upserts, tombstones, AND inserts in ONE SQL statement:
            // matches land as deletion vectors (+ appended row images),
            // so the steady-state write cost is O(batch) regardless of
            // how many files the matched keys touch
            // the batch df lives in the micro-batch's cloned session —
            // the view and the statement must use THAT session
            latest.createOrReplaceTempView("cow_mor_loop_src")
            val before = CowTable.latestManifest(table).get
            latest.sparkSession.sql(
              s"""MERGE INTO graft.`$table` t
                 |USING cow_mor_loop_src s
                 |ON t.k = s.k
                 |WHEN MATCHED AND s.op = 'd' THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET t.v = s.v,
                 |  t.payload = s.payload
                 |WHEN NOT MATCHED AND s.op <> 'd' THEN
                 |  INSERT (k, v, payload) VALUES (s.k, s.v, s.payload)
                 |""".stripMargin).collect()
            val after = CowTable.latestManifest(table).get
            assert(before.files.toSet.subsetOf(after.files.toSet),
              "a merge-on-read batch rewrote or dropped a base data file")
            merges += 1
          }
          ()
        }
        .start()
      try {
        history.grouped(60).foreach { slice =>
          input.addData(slice); q.processAllAvailable()
        }
      } finally q.stop()
    } finally spark.conf.set(graft.plans.CowDsv2.MorModeConf, "cow")

    def content = CowTable.read(spark, table)
      .select($"k", $"v", $"payload").as[(Long, Long, Double)].collect().toSet
    val ref = Changelog.compact(history.toDF("k", "v", "op", "payload"),
      Seq("k"), Seq(col("v")), col("op") === "d", Seq("v", "payload"))
      .select($"k", $"v", $"payload").as[(Long, Long, Double)].collect().toSet
    assert(content == ref && ref.nonEmpty)
    assert(merges == 4, s"expected 4 MOR merges after bootstrap, got $merges")
    assert(CowTable.latestManifest(table).get.dvs.nonEmpty,
      "the loop's updates/deletes must have landed as deletion vectors")
    // end-of-stream maintenance: selective pass then full materialization
    CowTable.rewriteDeletes(spark, table, minDeadFraction = 0.5)
    assert(content == ref)
    val m = CowTable.rewriteDeletes(spark, table)
    assert(m.dvs.isEmpty)
    assert(content == ref)
  }
}
