package graft.plans

import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.CowTable

/** `writeStream.toTable("graft.`/path`")` — the CoW table as a real
  * Structured Streaming sink: one table version per non-empty epoch,
  * exactly once across restarts and epoch replays. */
class CowStreamSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")

  private def freshDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("cow_stream_sink")

  test("toTable appends one version per batch, no duplicates on restart") {
    val base = freshDir()
    val t = base.resolve("t").toString
    val ckpt = base.resolve("ckpt").toString
    val input = MemoryStream[(Long, String)](spark)
    def start() = input.toDF().toDF("id", "name").writeStream
      .option("checkpointLocation", ckpt).toTable(s"graft.`$t`")

    val q = start()
    try {
      input.addData((0L until 50L).map(i => (i, s"n$i")))
      q.processAllAvailable()
      input.addData((50L until 80L).map(i => (i, s"n$i")))
      q.processAllAvailable()
    } finally q.stop()

    val mid = CowTable.latestManifest(t).get
    assert(CowTable.read(spark, t).count() == 80)

    // restart from the same checkpoint: only NEW data lands
    val q2 = start()
    try {
      input.addData((80L until 100L).map(i => (i, s"n$i")))
      q2.processAllAvailable()
    } finally q2.stop()

    val got = CowTable.read(spark, t).select("id", "name")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == (0L until 100L).map(i => (i, s"n$i")))
    val fin = CowTable.latestManifest(t).get
    assert(fin.version > mid.version)
    assert(mid.files.toSet.subsetOf(fin.files.toSet),
      "streaming appends must carry earlier epochs' files untouched")
    // and the DSv2/SQL read agrees
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$t`").head().getLong(0)
      == 100L)
  }

  test("streaming appends to a bucketed table keep the attribution") {
    val base = freshDir()
    val t = base.resolve("t").toString
    val ckpt = base.resolve("ckpt").toString
    CowTable.initBucketed((0L until 40L).map(i => (i, s"n$i"))
      .toDF("id", "name"), t, "id", 4)
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("id", "name").writeStream
      .option("checkpointLocation", ckpt).toTable(s"graft.`$t`")
    try {
      input.addData((40L until 90L).map(i => (i, s"n$i")))
      q.processAllAvailable()
    } finally q.stop()
    val m = CowTable.latestManifest(t).get
    val fb = CowTable.fileBuckets(spark, t, m)
    assert(fb.isDefined, "streaming epoch dropped the bucket attribution")
    // every streamed file holds rows of exactly its recorded bucket
    m.files.filter(_.contains("/stream-")).foreach { f =>
      val b = fb.get(CowTable.normalizePath(f))
      val distinct = spark.read.parquet(f)
        .select(org.apache.spark.sql.functions
          .pmod(org.apache.spark.sql.functions.xxhash64(col("id")),
            org.apache.spark.sql.functions.lit(4L)).cast("int"))
        .distinct().collect().map(_.getInt(0)).toSeq
      assert(distinct == Seq(b), s"streamed file $f mixes buckets")
    }
    assert(CowTable.read(spark, t).count() == 90L)
  }

  test("streaming appends to a partitioned table keep exact tuples") {
    val base = freshDir()
    val t = base.resolve("t").toString
    val ckpt = base.resolve("ckpt").toString
    CowTable.initPartitioned((0L until 40L)
      .map(i => (i, s"r${i % 4}", i * 2)).toDF("id", "region", "v"),
      t, Seq("region"))
    val input = MemoryStream[(Long, String, Long)](spark)
    val q = input.toDF().toDF("id", "region", "v").writeStream
      .option("checkpointLocation", ckpt).toTable(s"graft.`$t`")
    try {
      input.addData((40L until 70L).map(i => (i, s"r${i % 4}", i * 2)))
      q.processAllAvailable()
      input.addData((70L until 100L).map(i => (i, s"r${i % 4}", i * 2)))
      q.processAllAvailable()
    } finally q.stop()
    val m = CowTable.latestManifest(t).get
    // every streamed file recorded its exact partition tuple
    val parts = CowTable.entriesDF(spark, t, m)
      .filter(col("kind") === "data").select("part").collect()
    assert(parts.nonEmpty && parts.forall(!_.isNullAt(0)),
      "a streamed file lost its partition tuple")
    // exact partition pruning composes with the streamed epochs
    val planned = CowTable.pruneDataFiles(spark, t, m, $"region" === "r2")
    assert(planned.nonEmpty && planned.size < m.files.size)
    assert(planned.forall(_.contains("__p_region=r2")))
    val got = CowTable.read(spark, t).select("id", "v")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.length == 100 && got.forall { case (id, v) => v == id * 2 })
  }

  test("a replayed epoch commit is exactly-once at every crash point") {
    val base = freshDir()
    val t = base.resolve("t").toString
    CowTable.init(Seq((0L, "seed")).toDF("id", "name"), t)
    val table = new CowDsv2Table(t)
    val info = new LogicalWriteInfo {
      override def queryId(): String = "q-replay-test"
      override def schema() = table.schema()
      override def options() = CaseInsensitiveStringMap.empty()
    }
    val sw = table.newWriteBuilder(info).build().toStreaming
    val fac = sw.createStreamingWriterFactory(null)

    def stage(epoch: Long): Array[WriterCommitMessage] = {
      val w = fac.createWriter(0, 7L, epoch)
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](epoch + 100L,
          org.apache.spark.unsafe.types.UTF8String.fromString(s"e$epoch")))
      w.write(row)
      Array(w.commit())
    }

    // normal epoch
    sw.commit(0L, stage(0L))
    val v1 = CowTable.latestManifest(t).get.version
    assert(CowTable.read(spark, t).count() == 2)

    // whole-epoch replay (commit called again, epoch already recorded)
    sw.commit(0L, stage(0L))
    assert(CowTable.latestManifest(t).get.version == v1,
      "a recorded epoch must not commit again")
    assert(CowTable.read(spark, t).count() == 2)

    // crash-window replay: manifest committed but epoch record LOST —
    // path membership in the manifest must stop the re-add
    val epochFile = java.nio.file.Paths.get(
      s"$t/stream-q-replay-test/_epoch")
    java.nio.file.Files.delete(epochFile)
    sw.commit(0L, stage(0L))
    assert(CowTable.latestManifest(t).get.version == v1,
      "replay after a lost epoch record must detect committed paths")
    assert(CowTable.read(spark, t).count() == 2)
    assert(java.nio.file.Files.isRegularFile(epochFile),
      "the replay must re-record the epoch")

    // a later epoch still commits normally
    sw.commit(1L, stage(1L))
    assert(CowTable.latestManifest(t).get.version == v1 + 1)
    assert(CowTable.read(spark, t).count() == 3)

    // zero-row epoch advances the record without a version
    sw.commit(2L, Array.empty)
    assert(CowTable.latestManifest(t).get.version == v1 + 1)
  }

  test("upsert sink: staged epoch files commit BY REFERENCE and a " +
      "crash-window replay is detected by manifest membership") {
    val base = freshDir()
    val t = base.resolve("t").toString
    CowTable.init(Seq((1L, 10L), (2L, 20L)).toDF("k", "x")
      .repartition(1), t)
    val table = new CowDsv2Table(t)
    val opts = new java.util.HashMap[String, String]()
    opts.put("upsertKeys", "k")
    val info = new LogicalWriteInfo {
      override def queryId(): String = "q-upsert-replay"
      override def schema() = table.schema()
      override def options() = new CaseInsensitiveStringMap(opts)
    }
    val sw = table.newWriteBuilder(info).build().toStreaming
    val fac = sw.createStreamingWriterFactory(null)

    def stage(epoch: Long, k: Long, x: Long): Array[WriterCommitMessage] = {
      val w = fac.createWriter(0, 7L, epoch)
      w.write(new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](k, x)))
      Array(w.commit())
    }

    // normal epoch: update k=2 — ONE delta version whose data leg is
    // the staged file itself (no read-back rewrite)
    sw.commit(0L, stage(0L, 2L, 25L))
    val m1 = CowTable.latestManifest(t).get
    assert(m1.version == 1, s"one upsert version expected: $m1")
    assert(m1.dvs.nonEmpty, "matched update must land as a DV")
    assert(m1.files.exists(_.contains("/stream-q-upsert-replay/e0")),
      s"the staged epoch file must be committed by reference: ${m1.files}")
    def content() = CowTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(content() == Map(1L -> 10L, 2L -> 25L))

    // whole-epoch replay (epoch recorded): no new version
    sw.commit(0L, stage(0L, 2L, 25L))
    assert(CowTable.latestManifest(t).get.version == m1.version,
      "a recorded epoch must not commit again")

    // crash-window replay: upsert committed but epoch record LOST —
    // manifest membership of the staged paths must stop the re-apply
    // (the old rewrite path would have committed a redundant version)
    val epochFile = java.nio.file.Paths.get(
      s"$t/stream-q-upsert-replay/_epoch")
    java.nio.file.Files.delete(epochFile)
    sw.commit(0L, stage(0L, 2L, 25L))
    assert(CowTable.latestManifest(t).get.version == m1.version,
      "replay after a lost epoch record must detect committed paths")
    assert(content() == Map(1L -> 10L, 2L -> 25L))
    assert(java.nio.file.Files.isRegularFile(epochFile),
      "the replay must re-record the epoch")

    // a later epoch (insert + update) still commits normally
    sw.commit(1L, stage(1L, 5L, 50L))
    val m3 = CowTable.latestManifest(t).get
    assert(m3.version == m1.version + 1)
    assert(content() == Map(1L -> 10L, 2L -> 25L, 5L -> 50L))
  }
}
