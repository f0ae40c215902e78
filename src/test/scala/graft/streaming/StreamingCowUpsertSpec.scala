package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.CowTable

/** The update-mode streaming sink and its epoch apply
  * ([[CowTable.upsertMor]]): per-epoch merge-on-read deltas (no data
  * file rewrites), replay content-idempotency, and the capability
  * guard — update mode without `upsertKeys` is rejected by Spark's own
  * sink check. */
class StreamingCowUpsertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_stream_upsert")

  test("update-mode aggregation upserts per epoch as MOR deltas") {
    spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    val base = freshDir()
    val t = base.resolve("t").toString
    val src = base.resolve("in")
    java.nio.file.Files.createDirectories(src)
    def slice(i: Int, rows: Seq[(Long, Long)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"su_$i")
      rows.toDF("k", "x").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).sorted.head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        src.resolve(f"0${i}_s.parquet"))
      ()
    }
    def run(): Unit = {
      val q = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("k", "long").add("x", "long"))
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"x").as("sx"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .option("upsertKeys", "k")
        .toTable(s"graft.`$t`")
      try q.processAllAvailable() finally q.stop()
    }
    slice(0, Seq((1L, 10L), (2L, 20L)))
    run() // epoch 0: insert k=1, k=2
    val m1 = CowTable.latestManifest(t).get
    assert(m1.version == 1 && m1.dvs.isEmpty)
    slice(1, Seq((2L, 5L), (3L, 30L)))
    run() // restart, epoch 1: update k=2, insert k=3
    val m2 = CowTable.latestManifest(t).get
    assert(m2.version == 2, s"one more upsert expected: $m2")
    // MOR: epoch 1 rewrote NOTHING — every v1 data file is carried
    assert(m1.files.forall(m2.files.contains),
      "update epoch must not rewrite base files")
    assert(m2.dvs.nonEmpty, "matched update must land as a DV")
    val got = CowTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 10L)), 2L -> ((2L, 25L)),
      3L -> ((1L, 30L))), s"got $got")
  }

  test("a replayed upsert epoch is content-idempotent") {
    val t = s"${freshDir()}/t"
    CowTable.init(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "name", "v").repartition(1), t)
    val src = Seq((2L, "B", 20.0), (3L, "c", 3.0)).toDF("k", "name", "v")
    CowTable.upsertMor(spark, t, src, Seq("k"))
    val once = CowTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    // the crash-window replay: the same epoch applies again
    CowTable.upsertMor(spark, t, src, Seq("k"))
    val twice = CowTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(once.toSeq == Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0)))
    assert(twice.toSeq == once.toSeq, "replay must not change content")
    assert(CowTable.read(spark, t).groupBy($"k").count()
      .filter($"count" > 1L).count() == 0L, "replay duplicated a key")
  }

  test("NULL upsert keys are rejected with an explicit message, not a misleading duplicate error") {
    val t = s"${freshDir()}/t"
    CowTable.init(Seq((Some(1L), "a", 1.0), (Some(2L), "b", 2.0))
      .toDF("k", "name", "v").repartition(1), t)
    val src = Seq((Some(2L), "B", 20.0), (None, "null-key", 0.0))
      .toDF("k", "name", "v")
    val e = intercept[IllegalArgumentException] {
      CowTable.upsertMor(spark, t, src, Seq("k"))
    }
    assert(e.getMessage.contains("NULL"), s"message: ${e.getMessage}")
    assert(!e.getMessage.contains("duplicate keys"),
      s"message: ${e.getMessage}")
    // the table is untouched — a poison epoch commits nothing
    assert(CowTable.latestManifest(t).get.version == 0)
  }

  test("duplicate NULL-free keys still trip the cardinality check (null-safe count)") {
    val t = s"${freshDir()}/t"
    CowTable.init(Seq((1L, "a", 1.0)).toDF("k", "name", "v")
      .repartition(1), t)
    val dup = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "name", "v")
    val e = intercept[IllegalArgumentException] {
      CowTable.upsertMor(spark, t, dup, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate"), s"message: ${e.getMessage}")
  }

  test("update mode without upsertKeys is rejected by the sink check") {
    spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    val base = freshDir()
    val src = base.resolve("in")
    java.nio.file.Files.createDirectories(src)
    Seq((1L, 1L)).toDF("k", "x").coalesce(1).write
      .mode("overwrite").parquet(src.toString)
    val e = intercept[Exception] {
      val q = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("k", "long").add("x", "long"))
        .parquet(src.toString)
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .toTable(s"graft.`${base.resolve("t")}`")
      try q.processAllAvailable() finally q.stop()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("update"), s"unexpected error: $e")
  }

  test("partial-column upsert preserves absent columns on matches and " +
      "NULL-extends inserts; absent columns on a rename resolve forward") {
    val t = freshDir().resolve("t").toString
    CowTable.init(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("id", "name", "v").repartition(1), t)
    CowTable.upsertMor(spark, t,
      Seq((2L, 25.0), (3L, 30.0)).toDF("id", "v"), Seq("id"),
      preserveMissing = true)
    val got = CowTable.read(spark, t).as[(Long, String, Double)]
      .collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b", 25.0), (3L, null, 30.0)),
      s"got $got")
    // without the flag the old contract still refuses loudly
    val e = intercept[IllegalArgumentException] {
      CowTable.upsertMor(spark, t, Seq((2L, 9.9)).toDF("id", "v"),
        Seq("id"))
    }
    assert(e.getMessage.contains("every table column"))
    // preserve THROUGH a rename: the absent column's current name is
    // post-rename, its values live in pre-rename files — rawScan's
    // prior-name coalesce must feed the preserved postimage
    CowTable.alterTable(spark, t, renames = Map("name" -> "label"))
    CowTable.upsertMor(spark, t,
      Seq((2L, 26.0)).toDF("id", "v"), Seq("id"),
      preserveMissing = true)
    val after = CowTable.read(spark, t).select("id", "label", "v")
      .as[(Long, String, Double)].collect().toSet
    assert(after == Set((1L, "a", 10.0), (2L, "b", 26.0),
      (3L, null, 30.0)), s"after rename: $after")
  }

  test("partial-upsert replay is content-idempotent: preserved values " +
      "reproduce from the first run's own postimages") {
    val t = freshDir().resolve("t").toString
    CowTable.init(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("id", "name", "v").repartition(1), t)
    val src = Seq((2L, 25.0)).toDF("id", "v")
    CowTable.upsertMor(spark, t, src, Seq("id"), preserveMissing = true)
    val once = CowTable.read(spark, t).as[(Long, String, Double)]
      .collect().toSet
    CowTable.upsertMor(spark, t, src, Seq("id"), preserveMissing = true)
    val twice = CowTable.read(spark, t).as[(Long, String, Double)]
      .collect().toSet
    assert(once == twice && once.contains((2L, "b", 25.0)))
  }

  test("mid-run table evolution absorbs at the epoch boundary: rename " +
      "maps forward, filled column preserved, no restart") {
    import org.apache.spark.sql.types.StringType
    spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    val base = freshDir()
    val t = base.resolve("t").toString
    val src = base.resolve("in")
    java.nio.file.Files.createDirectories(src)
    def slice(i: Int, rows: Seq[(Long, Long)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"sm_$i")
      rows.toDF("k", "x").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).sorted.head
      val dest = src.resolve(f"0${i}_s.parquet")
      java.nio.file.Files.move(java.nio.file.Paths.get(part), dest)
      dest.toFile.setLastModified(1000000L + i * 10000L)
      ()
    }
    slice(0, Seq((1L, 10L), (2L, 20L)))
    val q = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("k", "long").add("x", "long"))
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
      .writeStream.outputMode("update")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .option("upsertKeys", "k")
      .toTable(s"graft.`$t`")
    try {
      q.processAllAvailable() // epoch 0: insert k=1, k=2
      // another writer renames x -> y, adds note, and fills it for k=1
      CowTable.alterTable(spark, t, renames = Map("x" -> "y"),
        adds = Seq(("note", StringType)))
      CowTable.upsertMor(spark, t, Seq((1L, "keep")).toDF("k", "note"),
        Seq("k"), preserveMissing = true)
      // the RUNNING stream's next epoch speaks (k, x): x maps to y,
      // k=1's note must survive its update, k=3 inserts with NULL note
      slice(1, Seq((1L, 11L), (3L, 30L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = CowTable.read(spark, t).select("k", "y", "note")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 11L, "keep"), (2L, 20L, null),
      (3L, 30L, null)), s"got $got")
  }

  test("a mid-run DROP of a column the stream produces still refuses " +
      "loudly instead of silently discarding its data") {
    spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    val base = freshDir()
    val t = base.resolve("t").toString
    val src = base.resolve("in")
    java.nio.file.Files.createDirectories(src)
    def slice(i: Int, rows: Seq[(Long, Long)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"sd_$i")
      rows.toDF("k", "x").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).sorted.head
      val dest = src.resolve(f"0${i}_s.parquet")
      java.nio.file.Files.move(java.nio.file.Paths.get(part), dest)
      dest.toFile.setLastModified(1000000L + i * 10000L)
      ()
    }
    slice(0, Seq((1L, 10L)))
    val q = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("k", "long").add("x", "long"))
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
      .writeStream.outputMode("update")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .option("upsertKeys", "k")
      .toTable(s"graft.`$t`")
    val e = intercept[Exception] {
      try {
        q.processAllAvailable()
        CowTable.alterTable(spark, t, drops = Seq("x"))
        slice(1, Seq((2L, 20L)))
        q.processAllAvailable()
      } finally q.stop()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("dropped column x mid-run") ||
      msg.contains("restart"), s"unexpected error: $e")
  }
}
