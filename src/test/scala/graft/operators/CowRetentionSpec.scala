package graft.operators

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Timestamp-based snapshot retention ([[CowTable.expireSnapshots]]):
  * "keep 7 days" semantics over commit timestamps with the SAME
  * liveness algebra as version-count vacuum, the latest snapshot
  * always survives, and a lagging change-feed consumer's registered
  * cursor BLOCKS expiry inside its window — the CDF contract is
  * time-denominated and must not lose a consumer's feed. */
class CowRetentionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cow_ret/" +
      java.util.UUID.randomUUID().toString.take(8)

  /** v0 init, v1..v3 merges — then BACKDATE each manifest's mtime so
    * v0..v1 look a day old and v2..v3 fresh. */
  private def fixture(): (String, Long) = {
    val t = freshTable()
    CowTable.init((0L until 40L).map(i => (i, s"n$i"))
      .toDF("id", "name").repartition(2), t)
    (1 to 3).foreach { k =>
      CowTable.mergeInto(spark, t,
        Seq((100L + k, s"v$k")).toDF("id", "name"), Seq("id"))
    }
    val now = System.currentTimeMillis()
    val day = 24L * 3600 * 1000
    Seq(0 -> (now - 2 * day), 1 -> (now - day),
      2 -> (now - 1000L), 3 -> now).foreach { case (v, ts) =>
      Files.setLastModifiedTime(
        Paths.get(t, "manifest", s"v$v.manifest"), FileTime.fromMillis(ts))
    }
    (t, now)
  }

  test("expire by commit timestamp: old versions go, survivors read exactly") {
    val (t, now) = fixture()
    val deleted = CowTable.expireSnapshots(spark, t,
      olderThanMs = 12L * 3600 * 1000, orphanAgeMs = Long.MaxValue,
      nowMs = now)
    // v0,v1 expired; v2,v3 kept
    assert(!Files.exists(Paths.get(t, "manifest", "v0.manifest")))
    assert(!Files.exists(Paths.get(t, "manifest", "v1.manifest")))
    assert(Files.exists(Paths.get(t, "manifest", "v2.manifest")))
    assert(Files.exists(Paths.get(t, "manifest", "v3.manifest")))
    val got = CowTable.read(spark, t).count()
    assert(got == 43L, s"survivor read must be exact, got $got")
    assert(CowTable.readVersion(spark, t, 2).count() == 42L)
    intercept[IllegalArgumentException] {
      CowTable.readVersion(spark, t, 0)
    }
    // nothing the kept snapshots reference was deleted
    assert(deleted.forall(f => !CowTable.latestManifest(t).get.files
      .map(CowTable.normalizePath).contains(CowTable.normalizePath(f))))
  }

  test("the latest snapshot survives even when older than the window") {
    val (t, now) = fixture()
    CowTable.expireSnapshots(spark, t, olderThanMs = 0L,
      orphanAgeMs = Long.MaxValue, nowMs = now + 3600 * 1000L)
    assert(CowTable.latestManifest(t).get.version == 3)
    assert(CowTable.read(spark, t).count() == 43L)
  }

  test("a lagging consumer's cursor blocks expiry inside its window") {
    val (t, now) = fixture()
    // consumer committed v1 — needs manifests v1.. to rebuild its feed
    CowTable.registerFeedCursor(t, "replica-a", 1)
    CowTable.expireSnapshots(spark, t, olderThanMs = 12L * 3600 * 1000,
      orphanAgeMs = Long.MaxValue, nowMs = now)
    assert(!Files.exists(Paths.get(t, "manifest", "v0.manifest")),
      "below the cursor still expires")
    assert(Files.exists(Paths.get(t, "manifest", "v1.manifest")),
      "the cursor's version must survive the time window")
    // the lagging consumer can still catch up, exactly
    val seen = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    val hi = graft.streaming.CowFollow.catchUp(spark, t, Seq("id"), 1) {
      (slice, v) => seen += ((v, slice.count()))
    }
    assert(hi == 3 && seen.toSeq == Seq((2, 1L), (3, 1L)))
    // once the consumer advances (or deregisters), expiry proceeds
    CowTable.registerFeedCursor(t, "replica-a", 3)
    CowTable.expireSnapshots(spark, t, olderThanMs = 12L * 3600 * 1000,
      orphanAgeMs = Long.MaxValue, nowMs = now)
    assert(!Files.exists(Paths.get(t, "manifest", "v1.manifest")))
    assert(CowTable.read(spark, t).count() == 43L)
  }

  test("an abandoned cursor ages out; expiryBlockers names who blocks") {
    val (t, now) = fixture()
    // consumer stuck at v1, its registration file a day stale
    CowTable.registerFeedCursor(t, "replica-dead", 1)
    Files.setLastModifiedTime(Paths.get(t, "consumers", "replica-dead"),
      FileTime.fromMillis(now - 24L * 3600 * 1000))
    // the operator signal: this cursor blocks the 12h window
    val blockers = CowTable.expiryBlockers(t,
      olderThanMs = 12L * 3600 * 1000, nowMs = now)
    assert(blockers == Map("replica-dead" -> 1))
    // without an age bound the stale cursor still pins v1
    CowTable.expireSnapshots(spark, t, olderThanMs = 12L * 3600 * 1000,
      orphanAgeMs = Long.MaxValue, nowMs = now)
    assert(Files.exists(Paths.get(t, "manifest", "v1.manifest")))
    // with a 1h age bound the abandoned cursor no longer blocks
    CowTable.expireSnapshots(spark, t, olderThanMs = 12L * 3600 * 1000,
      orphanAgeMs = Long.MaxValue, nowMs = now,
      maxCursorAgeMs = 3600 * 1000L)
    assert(!Files.exists(Paths.get(t, "manifest", "v1.manifest")),
      "a cursor stale beyond maxCursorAgeMs must stop pinning expiry")
    assert(CowTable.read(spark, t).count() == 43L)
    // a FRESH cursor at the same version would still block (refresh
    // clock, not version, decides abandonment)
    val (t2, now2) = fixture()
    CowTable.registerFeedCursor(t2, "replica-live", 1)
    CowTable.expireSnapshots(spark, t2, olderThanMs = 12L * 3600 * 1000,
      orphanAgeMs = Long.MaxValue, nowMs = now2,
      maxCursorAgeMs = 3600 * 1000L)
    assert(Files.exists(Paths.get(t2, "manifest", "v1.manifest")),
      "an actively-refreshed cursor must keep blocking inside its window")
  }

  test("vacuum deletes run executor-side; survivors identical (stream dirs + DVs)") {
    val t = freshTable()
    val df = (0L until 200L).map(i => (i, s"n$i")).toDF("id", "name")
      .withColumn("__f", (col("id") / 20L).cast("int") + 1)
    CowTable.initFiled(df, t, "__f", 10)
    CowTable.deleteWhere(spark, t, $"id" % 2L === 0L)
    CowTable.rewriteDeletes(spark, t) // every file rewritten; old gen dead
    // crashed-epoch stream litter, old enough to age out
    val sdir = Paths.get(t, "stream-test")
    Files.createDirectories(sdir)
    val litter = sdir.resolve("part-dead.parquet")
    Files.write(litter, Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(litter,
      FileTime.fromMillis(System.currentTimeMillis() - 3600 * 1000L))
    val before = CowTable.read(spark, t).collect()
      .map(_.getLong(0)).sorted.toSeq
    val deleted = CowTable.vacuum(spark, t, keepVersions = 1,
      orphanAgeMs = 60 * 1000L)
    assert(deleted.nonEmpty)
    assert(CowTable.lastVacuumExecutorDeletes.get() == deleted.size.toLong,
      "every physical delete must run inside a Spark task, none in a " +
        s"driver loop (task-side ${CowTable.lastVacuumExecutorDeletes.get()}" +
        s" vs reclaimed ${deleted.size})")
    assert(deleted.exists(_.contains("stream-test")),
      "aged stream litter must be reclaimed")
    assert(!Files.exists(litter))
    val after = CowTable.read(spark, t).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(after == before, "vacuum must never change the live snapshot")
  }

  test("the streaming change-feed source registers its cursor on batch commit") {
    val (t, _) = fixture()
    val ckpt = Files.createTempDirectory("graft_ret_stream").toString
    val name = "ret_stream_" +
      java.util.UUID.randomUUID().toString.take(8).replace("-", "")
    val q = spark.readStream.format("graft.streaming.CowFeedProvider")
      .option("table", t).option("keys", "id").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val cursors = CowTable.feedCursors(t)
    assert(cursors.size == 1 && cursors.keys.head.startsWith("stream-"),
      s"source must pin its progress at the table: $cursors")
    // plan-time pin = the batch's start (0); Spark may defer the
    // source commit() to the next cycle — either value protects the
    // stream's window
    val v = cursors.values.head
    assert(v >= 0 && v <= 3, s"cursor $v")
    // retention honors the pin: everything at or above it survives
    CowTable.expireSnapshots(spark, t, olderThanMs = 0L,
      orphanAgeMs = Long.MaxValue,
      nowMs = System.currentTimeMillis() + 3600 * 1000L)
    (v to 3).foreach { k =>
      assert(Files.exists(Paths.get(t, "manifest", s"v$k.manifest")),
        s"retention expired v$k inside the stream's window (cursor $v)")
    }
  }

  test("CowFollowSink.catchUp(cursorId) registers the high-water automatically") {
    val (t, _) = fixture()
    val sink = Files.createTempDirectory("graft_ret_sink").toString
    val hi = graft.streaming.CowFollowSink.catchUp(spark, t, Seq("id"),
      sink, cursorId = Some("sink-1"))
    assert(hi == 3)
    assert(CowTable.feedCursors(t) == Map("sink-1" -> 3))
    CowTable.dropFeedCursor(t, "sink-1")
    assert(CowTable.feedCursors(t).isEmpty)
  }
}
