package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.CowTable

/** Follow-the-table: a replica driven ONLY by per-version change
  * slices equals the final snapshot, while the writer keeps
  * committing concurrently. */
class CowFollowSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cow_follow/" +
      java.util.UUID.randomUUID().toString.take(8)

  /** Replica state driven by CDF rows. */
  private def applySlice(replica: scala.collection.mutable.Map[Long, (String, Double)],
      slice: org.apache.spark.sql.DataFrame): Unit =
    slice.collect().foreach { r =>
      val id = r.getLong(r.fieldIndex("id"))
      r.getString(r.fieldIndex("_change_type")) match {
        case "insert" | "update_postimage" =>
          replica(id) = (r.getString(r.fieldIndex("name")),
            r.getDouble(r.fieldIndex("v")))
        case "delete" => replica.remove(id)
        case "update_preimage" => // pre-images are informational
      }
    }

  test("transactional sink: restart mid-feed never re-applies a slice") {
    val t = freshTable()
    val sink = freshTable() + "_sink"
    CowTable.init((0L until 40L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "v").repartitionByRange(2, $"id"), t)
    CowTable.mergeInto(spark, t,
      Seq((1L, "u1", 1.5), (50L, "new", 50.0)).toDF("id", "name", "v"),
      Seq("id"))                                   // v1
    CowTable.deleteWhere(spark, t, $"id" === 5L)   // v2
    assert(CowFollowSink.catchUp(spark, t, Seq("id"), sink) == 2)
    assert(CowFollowSink.committedVersion(sink) == 2)
    val feed2 = CowFollowSink.readFeed(spark, sink)
    assert(feed2.filter($"_commit_version" === 1L).count() == 3) // pre+post+ins
    assert(feed2.filter($"_commit_version" === 2L)
      .filter($"_change_type" === "delete").count() == 1)
    // capture slice-v1's bytes: a restart must not touch it
    val v1dir = java.nio.file.Paths.get(sink, "slice-v1")
    val v1stamp = java.nio.file.Files.list(v1dir).toArray.map(_.toString)
      .sorted.map(f => java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f)).toMillis).toSeq
    // CRASH SIMULATION: v3 commits on the source; a consumer wrote
    // slice bytes for v3 but died BEFORE the marker — garbage in place
    CowTable.mergeInto(spark, t,
      Seq((2L, "u2", 2.5)).toDF("id", "name", "v"), Seq("id")) // v3
    Seq((999L, "garbage", 0.0, "insert", 3L))
      .toDF("id", "name", "v", "_change_type", "_commit_version")
      .write.mode("overwrite").parquet(s"$sink/slice-v3")
    // the orphan bytes are INVISIBLE (no marker)
    assert(CowFollowSink.readFeed(spark, sink)
      .filter($"id" === 999L).count() == 0)
    // restart: recomputes v3 over the garbage, commits once
    assert(CowFollowSink.catchUp(spark, t, Seq("id"), sink) == 3)
    val feed3 = CowFollowSink.readFeed(spark, sink)
    assert(feed3.filter($"id" === 999L).count() == 0, "orphan bytes survived")
    assert(feed3.filter($"_commit_version" === 3L).count() == 2) // pre+post
    // no duplicate application: committed slices untouched on restart
    val v1stamp2 = java.nio.file.Files.list(v1dir).toArray.map(_.toString)
      .sorted.map(f => java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f)).toMillis).toSeq
    assert(v1stamp2 == v1stamp, "restart rewrote an already-committed slice")
    // idle restart is a no-op
    assert(CowFollowSink.catchUp(spark, t, Seq("id"), sink) == 3)
    // the feed reconstructs the table: apply slices over the v0 snapshot
    val replica = scala.collection.mutable.Map[Long, (String, Double)]()
    CowTable.readVersion(spark, t, 0).collect().foreach(r =>
      replica(r.getLong(0)) = (r.getString(1), r.getDouble(2)))
    (1 to 3).foreach(v => applySlice(replica,
      CowFollowSink.readFeed(spark, sink)
        .filter($"_commit_version" === v.toLong)))
    val want = CowTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(replica.toMap == want)
  }

  test("caught-up-over-maintenance sink yields an empty typed feed") {
    val t = freshTable()
    val sink = freshTable() + "_sink"
    CowTable.init((0L until 30L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "v").repartitionByRange(3, $"id"), t)
    // a genuinely fresh sink (no commits at all) still throws
    intercept[IllegalArgumentException] {
      CowFollowSink.readFeed(spark, s"$sink-fresh")
    }
    // layout maintenance only: compaction advances the version with a
    // change-free slice
    CowTable.compactTable(spark, t, targetBytes = Long.MaxValue)
    assert(CowFollowSink.catchUp(spark, t, Seq("id"), sink) == 1)
    val feed = CowFollowSink.readFeed(spark, sink)
    assert(feed.count() == 0L, "maintenance-only feed must be empty")
    assert(feed.columns.contains("_commit_version") &&
      feed.columns.contains("_change_type") &&
      feed.columns.contains("id"), s"feed schema lost: ${feed.columns.toSeq}")
    // the sink is usable afterwards: a real change flows through
    CowTable.mergeInto(spark, t,
      Seq((100L, "new", 1.0)).toDF("id", "name", "v"), Seq("id"))
    assert(CowFollowSink.catchUp(spark, t, Seq("id"), sink) == 2)
    assert(CowFollowSink.readFeed(spark, sink)
      .filter($"_change_type" === "insert").count() == 1L)
  }

  test("catchUp replays every version; replica equals the snapshot") {
    val t = freshTable()
    CowTable.init((0L until 50L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "v").repartitionByRange(3, $"id"), t)
    val replica = scala.collection.mutable.Map[Long, (String, Double)]()
    // v0 bootstrap: snapshot read, versions follow from there
    CowTable.readVersion(spark, t, 0).collect().foreach(r =>
      replica(r.getLong(0)) = (r.getString(1), r.getDouble(2)))
    var hw = 0
    // a batch of writes, then catch up (repeat, interleaved)
    CowTable.mergeInto(spark, t,
      Seq((3L, "u3", 3.5), (60L, "new", 60.0)).toDF("id", "name", "v"),
      Seq("id"))
    CowTable.deleteWhere(spark, t, $"id" === 10L || $"id" === 11L)
    hw = CowFollow.catchUp(spark, t, Seq("id"), hw)(
      (s, _) => applySlice(replica, s))
    assert(hw == 2)
    CowTable.mergeInto(spark, t,
      Seq((60L, "new2", 61.0), (10L, "back", 10.5)).toDF("id", "name", "v"),
      Seq("id"))
    // layout maintenance must be INVISIBLE to the follower
    val sizes = CowTable.latestManifest(t).get.files
      .map(f => java.nio.file.Files.size(java.nio.file.Paths.get(f)))
    CowTable.compactTable(spark, t, targetBytes = sizes.max * 10,
      smallThreshold = Some(sizes.max + 1))
    hw = CowFollow.catchUp(spark, t, Seq("id"), hw)(
      (s, _) => applySlice(replica, s))
    assert(hw == CowTable.latestManifest(t).get.version)
    val want = CowTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(replica.toMap == want, "replica diverged from the snapshot")
  }

  test("follow tracks a concurrently-committing writer to convergence") {
    val t = freshTable()
    CowTable.init(Seq((0L, "n0", 0.0)).toDF("id", "name", "v"), t)
    val replica = scala.collection.mutable.Map[Long, (String, Double)]()
    CowTable.readVersion(spark, t, 0).collect().foreach(r =>
      replica(r.getLong(0)) = (r.getString(1), r.getDouble(2)))
    val writer = new Thread(() => {
      for (i <- 1 to 5) {
        CowTable.mergeInto(spark, t,
          Seq((i.toLong, s"w$i", i * 1.0)).toDF("id", "name", "v"),
          Seq("id"))
        Thread.sleep(30)
      }
      CowTable.deleteWhere(spark, t, $"id" === 2L)
    })
    writer.start()
    val versions = scala.collection.mutable.ArrayBuffer[Int]()
    val hw = CowFollow.follow(spark, t, Seq("id"), 0,
      pollMs = 40L, idlePolls = 12) { (s, v) =>
      applySlice(replica, s); versions += v
    }
    writer.join()
    // the writer may have raced the last idle window — one final catch-up
    val hw2 = CowFollow.catchUp(spark, t, Seq("id"), hw)(
      (s, v) => { applySlice(replica, s); versions += v })
    assert(hw2 == CowTable.latestManifest(t).get.version)
    assert(versions.toSeq == versions.sorted.toSeq &&
      versions.distinct.size == versions.size, s"out-of-order: $versions")
    val want = CowTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(replica.toMap == want)
  }
}
