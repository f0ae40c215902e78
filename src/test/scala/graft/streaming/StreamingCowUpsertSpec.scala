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
}
