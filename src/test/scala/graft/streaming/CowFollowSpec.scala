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
