package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Changelog

/** Restart recovery: a stateful streaming query is STOPPED mid-replay on
  * a real checkpoint directory and restarted; the converged output must
  * still equal the batch oracle. This is the fault-tolerance half of the
  * batch≡stream contract — the state store (session windows), the file
  * source's seen-files log, and foreachBatch's batch-id dedup line all
  * have to survive the restart for these to pass.
  *
  * The sink is `foreachBatch` → parquet: the memory sink refuses
  * checkpoint recovery in append mode (by design — it is not
  * fault-tolerant), while foreachBatch is the production sink shape and
  * recovers. */
class StreamingRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }

  /** Move the single part-file of a one-partition parquet write into
    * `dest` (file-source staging, same pattern as the gate harnesses). */
  private def stageOneFile(df: DataFrame, dest: java.nio.file.Path): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted.head
    java.nio.file.Files.move(java.nio.file.Paths.get(part), dest)
    deleteTree(tmp)
  }

  test("session aggregation state survives a checkpoint stop/restart") {
    val dir = TestSpark.sf0001
    val raw = Tables.eventsRaw(spark, dir)
    val maxUs = Tables.maxTsMicros(raw)
    val tsType = raw.schema("ts").dataType
    val src = java.nio.file.Files.createTempDirectory("graft_recov_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_recov_ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft_recov_out")
    // phase 1 source: ONLY the real events — every session stays open.
    // The mtime is pinned BEFORE the first run: FileStreamSource ages
    // files against the newest seen mtime (default maxFileAge 7 days),
    // so the punctuation files staged later must sort after this one on
    // the same synthetic clock or the restarted source discards them.
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("00_events.parquet"))
    src.resolve("00_events.parquet").toFile.setLastModified(1000000L)
    def startQuery() = {
      val stream = Tables.normalizeEventTs(
        spark.readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src.toString))
      EventStreams.streamingSessions(stream)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out.toString)
        }
        .option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Append())
        .start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // after batch 0 a no-data batch advances the watermark to
    // max(ts) − 10 min and flushes every session that closed before it;
    // sessions still OPEN at the stop (near the end of the data) exist
    // only in the state store — they are the recovery payload
    val emittedBeforeRestart =
      try spark.read.parquet(out.toString).count() catch { case _: Exception => 0L }
    // phase 2: two punctuation files push the watermark past every
    // session (the drain/barrier pattern), then RESTART from checkpoint
    Seq((1, 10L), (2, 20L)).foreach { case (idx, hours) =>
      stageOneFile(
        Tables.punctDF(spark, tsType,
          Seq((-idx.toLong, maxUs + hours * 3600L * 1000000L, -1L))),
        src.resolve(f"0$idx%d_punct.parquet"))
    }
    Seq("00_events.parquet", "01_punct.parquet", "02_punct.parquet")
      .zipWithIndex.foreach { case (f, i) =>
        src.resolve(f).toFile.setLastModified(1000000L + i * 10000L)
      }
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out.toString)
      .filter(col("user_id") =!= -1L)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val ref = EventStreams.sessionCounts(Tables.events(spark, dir))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // the restart must have had real recovery work: some sessions were
    // still open in the state store when the first run stopped
    assert(emittedBeforeRestart < ref.size,
      s"nothing left to recover ($emittedBeforeRestart of ${ref.size} emitted)")
    assert(got == ref,
      s"restarted stream diverged: got ${got.size} rows, expected ${ref.size}")
    // set equality tolerates duplicates; the parquet row count does not —
    // a replayed batch after restart would double-emit
    val totalRows = spark.read.parquet(out.toString)
      .filter(col("user_id") =!= -1L).count()
    assert(totalRows == ref.size.toLong,
      s"duplicate emissions after restart: $totalRows rows for ${ref.size} sessions")
    Seq(src, ckpt, out).foreach(deleteTree)
  }

  test("foreachBatch CDC loop resumes from checkpoint without reprocessing") {
    import spark.implicits._
    val history = (1L to 300L).map(i =>
      (i % 20, i, if (i % 13 == 0) "d" else "u", i * 1.5))
    val slices = history.grouped(75).toSeq // 4 slices → 4 micro-batches
    val src = java.nio.file.Files.createTempDirectory("graft_cdc_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ckpt")
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_snap")
    def stageSlice(i: Int): Unit = {
      stageOneFile(slices(i).toDF("k", "v", "op", "payload"),
        src.resolve(f"slice_$i%02d.parquet"))
      src.resolve(f"slice_$i%02d.parquet").toFile
        .setLastModified(1000000L + i * 10000L)
      ()
    }
    // the stored snapshot is discovered from DISK (latest batch id), not
    // from driver memory — the property that makes the loop restartable
    def latestSnap(): Option[String] = {
      val snaps = java.nio.file.Files.list(root).toArray.map(_.toString)
        .filter(_.contains("snap_"))
      if (snaps.isEmpty) None else Some(snaps.maxBy(
        _.split("snap_").last.toLong))
    }
    val schema = slices.head.toDF("k", "v", "op", "payload").schema
    def startLoop() =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val snapshot = latestSnap() match {
            case Some(d) => spark.read.parquet(d).withColumn("op", lit("u"))
            case None => batch.limit(0)
          }
          Changelog.applyChangelog(snapshot, batch, Seq("k"),
            Seq(col("v")), col("op") === "d", Seq("v", "payload"))
            .write.mode("overwrite").parquet(root.resolve(s"snap_$id").toString)
        }
        .option("checkpointLocation", ckpt.toString)
        .start()
    stageSlice(0); stageSlice(1)
    val q1 = startLoop()
    try q1.processAllAvailable() finally q1.stop()
    val snapsAfterRun1 = java.nio.file.Files.list(root).count()
    assert(snapsAfterRun1 == 2, s"expected 2 snapshots, got $snapsAfterRun1")
    stageSlice(2); stageSlice(3)
    val q2 = startLoop()
    try q2.processAllAvailable() finally q2.stop()
    // batch ids CONTINUE after restart (2, 3): slices 0/1 were not
    // reprocessed — the checkpoint's seen-files log carried over
    val snapIds = java.nio.file.Files.list(root).toArray.map(_.toString)
      .map(_.split("snap_").last.toLong).sorted.toSeq
    assert(snapIds == Seq(0L, 1L, 2L, 3L), s"snapshot ids: $snapIds")
    val stored = spark.read.parquet(latestSnap().get)
      .select($"k", $"v", $"payload").as[(Long, Long, Double)]
      .collect().toSet
    val ref = Changelog.compact(history.toDF("k", "v", "op", "payload"),
      Seq("k"), Seq(col("v")), col("op") === "d", Seq("v", "payload"))
      .select($"k", $"v", $"payload").as[(Long, Long, Double)]
      .collect().toSet
    assert(stored == ref)
    Seq(src, ckpt, root).foreach(deleteTree)
  }
}
