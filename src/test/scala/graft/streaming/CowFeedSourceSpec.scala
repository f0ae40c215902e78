package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.CowTable

/** The change feed as a REAL DSv2 MicroBatchStream: offsets are table
  * versions, batches are netted change slices, the checkpoint makes
  * restarts resume without re-delivery, and the parquet file sink's
  * transaction log composes for end-to-end exactly-once. */
class CowFeedSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_feed_$tag/" +
      java.util.UUID.randomUUID().toString.take(8)

  test("restart resumes from the checkpoint; replica equals the snapshot") {
    val t = fresh("tbl")
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    CowTable.init((0L until 40L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "v").repartitionByRange(2, $"id"), t)
    CowTable.mergeInto(spark, t,
      Seq((1L, "u1", 1.5), (50L, "new", 50.0)).toDF("id", "name", "v"),
      Seq("id"))                                  // v1
    CowTable.deleteWhere(spark, t, $"id" === 5L)  // v2

    def run(): Unit = {
      val q = spark.readStream.format("graft.streaming.CowFeedProvider")
        .option("table", t).option("keys", "id").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    run()
    val feed1 = spark.read.parquet(out)
    val c1 = feed1.groupBy($"_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // netted (0,2]: update 1 (pre+post), insert 50, delete 5
    assert(c1 == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "insert" -> 1L, "delete" -> 1L), s"first batch wrong: $c1")
    assert(feed1.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))

    // two more commits while the stream is DOWN, then restart
    CowTable.mergeInto(spark, t,
      Seq((2L, "u2", 2.5), (60L, "late", 60.0)).toDF("id", "name", "v"),
      Seq("id"))                                      // v3
    CowTable.deleteWhere(spark, t, $"id" === 60L)     // v4 (nets w/ v3)
    run()
    val feed2 = spark.read.parquet(out)
    // the first batch was NOT re-delivered
    assert(feed2.filter($"_commit_version" === 2L).count() ==
      feed1.filter($"_commit_version" === 2L).count())
    // the new batch nets (2,4]: update id 2; insert+delete of 60 nets out
    val b2 = feed2.filter($"_commit_version" === 4L)
      .groupBy($"_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b2 == Map("update_preimage" -> 1L, "update_postimage" -> 1L),
      s"netted second batch wrong: $b2")
    // idle restart delivers nothing new
    run()
    assert(spark.read.parquet(out).count() == feed2.count())

    // replica: v0 snapshot + slices in version order == final snapshot
    val replica = scala.collection.mutable.Map[Long, (String, Double)]()
    CowTable.readVersion(spark, t, 0).collect().foreach(r =>
      replica(r.getLong(0)) = (r.getString(1), r.getDouble(2)))
    val all = spark.read.parquet(out)
    all.select("_commit_version").distinct().collect().map(_.getLong(0))
      .sorted.foreach { cv =>
        all.filter($"_commit_version" === cv).collect().foreach { r =>
          val id = r.getLong(r.fieldIndex("id"))
          r.getString(r.fieldIndex("_change_type")) match {
            case "insert" | "update_postimage" =>
              replica(id) = (r.getString(r.fieldIndex("name")),
                r.getDouble(r.fieldIndex("v")))
            case "delete" => replica.remove(id)
            case _ =>
          }
        }
      }
    val want = CowTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(replica.toMap == want)
  }

  test("a mid-stream commit lands in the next batch; options validated") {
    val t = fresh("tbl2")
    CowTable.init((0L until 10L).map(i => (i, i * 2L)).toDF("id", "w")
      .repartition(1), t)
    val ckpt = fresh("ckpt2")
    val q = spark.readStream.format("graft.streaming.CowFeedProvider")
      .option("table", t).option("keys", "id").load()
      .writeStream.format("memory").queryName("cow_feed_live")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cow_feed_live").count() == 0) // nothing past v0
      CowTable.mergeInto(spark, t, Seq((3L, 99L)).toDF("id", "w"), Seq("id"))
      q.processAllAvailable()
      val rows = spark.table("cow_feed_live")
        .select("id", "w", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .sortBy(_._3)
      assert(rows.toSeq == Seq((3L, 99L, "update_postimage", 1L),
        (3L, 6L, "update_preimage", 1L)))
    } finally q.stop()
    // missing keys option is refused at stream build
    val err = intercept[Exception] {
      val bad = spark.readStream.format("graft.streaming.CowFeedProvider")
        .option("table", t).load()
        .writeStream.format("memory").queryName("cow_feed_bad")
        .option("checkpointLocation", fresh("ckpt3")).start()
      try bad.processAllAvailable() finally bad.stop()
    }
    assert(err.getMessage.contains("keys") ||
      Option(err.getCause).exists(_.getMessage.contains("keys")))
  }
}
