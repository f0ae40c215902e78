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

  test("replay across an alterTable: per-version slices rename forward, " +
      "up-cast the widened column, and NULL-extend the added one") {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val t = fresh("evolve")
    CowTable.init((0L until 20L).map(i => (i, s"n$i", i.toInt))
      .toDF("id", "name", "flag")
      .withColumn("flag", $"flag".cast("int")).repartition(2), t) // v0
    CowTable.mergeInto(spark, t,
      Seq((1L, "u1", 101), (50L, "new", 7)).toDF("id", "name", "flag")
        .withColumn("flag", $"flag".cast("int")), Seq("id"))      // v1
    CowTable.alterTable(spark, t, renames = Map("name" -> "label"),
      widens = Map("flag" -> LongType),
      adds = Seq(("note", StringType)))                           // v2
    CowTable.deleteWhere(spark, t, $"id" === 3L)                  // v3

    // the consumer starts against the EVOLVED table and replays from
    // v0 one version per batch — the v0→v1 slice speaks the pre-alter
    // schema and must project onto the evolved one
    val sink = "cow_feed_evolve_" +
      java.util.UUID.randomUUID().toString.take(8).replace("-", "")
    val q = spark.readStream.format("graft.streaming.CowFeedProvider")
      .option("table", t).option("keys", "id")
      .option("maxVersionsPerBatch", "1").load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", fresh("ckpt_ev")).start()
    try q.processAllAvailable() finally q.stop()
    val feed = spark.table(sink)
    assert(feed.columns.toSet ==
      Set("id", "label", "flag", "note", "_change_type", "_commit_version"))
    assert(feed.schema("flag").dataType == LongType)
    val rows = feed.collect().map(r => (r.getLong(0),
      r.getString(1), r.getLong(2),
      Option(r.getString(3)), r.getString(4), r.getLong(5))).toSet
    assert(rows == Set(
      // v0→v1: old-schema slice, renamed forward + widened + NULL note
      (1L, "n1", 1L, None, "update_preimage", 1L),
      (1L, "u1", 101L, None, "update_postimage", 1L),
      (50L, "new", 7L, None, "insert", 1L),
      // v1→v2 (the alter itself) is change-free: nothing at version 2
      // v2→v3: evolved-schema slice
      (3L, "n3", 3L, None, "delete", 3L)), s"feed wrong: $rows")
  }

  test("alignFeedSlice maps a newer slice BACK to a running stream's " +
      "schema and refuses a mid-stream widen") {
    import org.apache.spark.sql.types._
    // the slice speaks an evolved schema: label carries the prior-name
    // chain [name]; the running stream still expects `name`
    val chain = new MetadataBuilder()
      .putStringArray(CowTable.PrevNamesKey, Array("name")).build()
    val sliceSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("label", StringType, nullable = true, chain),
      StructField("added_later", StringType),
      StructField("_change_type", StringType)))
    val slice = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(7L, "seven", "x", "insert")), sliceSchema)
    val streamSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
    val aligned = CowTable.alignFeedSlice(slice, streamSchema).collect()
    // label maps back to name; the column added after the consumer
    // started is invisible until it restarts
    assert(aligned.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((7L, "seven", "insert")))

    // a widened column cannot down-cast into the running stream
    val wideSlice = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(7L, 9L, "insert")),
      StructType(Seq(StructField("id", LongType),
        StructField("flag", LongType),
        StructField("_change_type", StringType))))
    val narrowStream = StructType(Seq(
      StructField("id", LongType), StructField("flag", IntegerType),
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
    val e = intercept[IllegalArgumentException] {
      CowTable.alignFeedSlice(wideSlice, narrowStream)
    }
    assert(e.getMessage.contains("restart the stream"))
  }

  test("failOnNewColumns: a post-start added column refuses instead of " +
      "staying invisible; a renamed column still aligns silently") {
    import org.apache.spark.sql.types._
    val chain = new MetadataBuilder()
      .putStringArray(CowTable.PrevNamesKey, Array("name")).build()
    val sliceSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("label", StringType, nullable = true, chain),
      StructField("added_later", StringType),
      StructField("_change_type", StringType)))
    val slice = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(7L, "seven", "x", "insert")), sliceSchema)
    val streamSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
    // default: silently invisible (pinned by the previous test); strict:
    // loud refusal naming the column
    val e = intercept[IllegalArgumentException] {
      CowTable.alignFeedSlice(slice, streamSchema, failOnNewColumns = true)
    }
    assert(e.getMessage.contains("added_later") &&
      e.getMessage.contains("failOnNewColumns"))
    // a RENAME is consumed through the prior-name chain — strict mode
    // only fires on truly-unconsumed (added) columns
    val renamedOnly = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(7L, "seven", "insert")),
      StructType(Seq(StructField("id", LongType),
        StructField("label", StringType, nullable = true, chain),
        StructField("_change_type", StringType))))
    val ok = CowTable.alignFeedSlice(renamedOnly, streamSchema,
      failOnNewColumns = true).collect()
    assert(ok.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "seven")))
  }

  test("failOnNewColumns end-to-end: a mid-stream ADD fails the query " +
      "with the restart diagnosis") {
    val t = fresh("strict")
    CowTable.init((0L until 10L).map(i => (i, i * 2L)).toDF("id", "w")
      .repartition(1), t)
    val q = spark.readStream.format("graft.streaming.CowFeedProvider")
      .option("table", t).option("keys", "id")
      .option("failOnNewColumns", "true").load()
      .writeStream.format("memory").queryName("cow_feed_strict")
      .option("checkpointLocation", fresh("ckpt_strict")).start()
    try {
      q.processAllAvailable()
      // pre-evolution changes flow
      CowTable.mergeInto(spark, t, Seq((3L, 99L)).toDF("id", "w"),
        Seq("id"))
      q.processAllAvailable()
      assert(spark.table("cow_feed_strict").count() == 2)
      // the table gains a column the running stream never declared…
      import org.apache.spark.sql.types.StringType
      CowTable.alterTable(spark, t, adds = Seq(("note", StringType)))
      CowTable.mergeInto(spark, t, Seq((4L, 8L, "n4"))
        .toDF("id", "w", "note"), Seq("id"))
      // …and the strict stream refuses instead of silently dropping it
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(x: Throwable): Seq[String] =
        Option(x).toSeq.flatMap(t =>
          Option(t.getMessage).toSeq ++ msgs(t.getCause))
      assert((msgs(e) ++ Option(q.exception.orNull).toSeq.flatMap(msgs))
        .exists(m => m.contains("failOnNewColumns") && m.contains("note")))
    } finally q.stop()
  }
}
