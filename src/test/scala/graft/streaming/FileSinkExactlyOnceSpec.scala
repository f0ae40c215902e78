package graft.streaming

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exactly-once FILE output: the native parquet streaming sink commits
  * files through its `_spark_metadata` transaction log, and readers
  * resolve that log instead of listing the directory. Complements
  * StreamingRecoverySpec (which proves STATE recovery through
  * foreachBatch): here the sink itself is the recovery surface —
  * restart must not double-write, and files that reached the directory
  * WITHOUT reaching the log (task retries, speculative executors, a
  * crash between write and commit) must be invisible to readers.
  *
  * At 100 TB this is the property that lets a thousand-task streaming
  * job write a table other jobs read concurrently: the log is the
  * atomic commit point, the filesystem is just a byte store. */
class FileSinkExactlyOnceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }

  private def stageOneFile(df: DataFrame, dest: java.nio.file.Path): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted.head
    java.nio.file.Files.move(java.nio.file.Paths.get(part), dest)
    deleteTree(tmp)
  }

  test("parquet sink: restart does not double-write; orphan files stay invisible") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("sink_src")
    val ckpt = java.nio.file.Files.createTempDirectory("sink_ckpt")
    val out = java.nio.file.Files.createTempDirectory("sink_out")
    val schema = Seq((1L, 1.0)).toDF("id", "v").schema
    def stage(idx: Int, ids: Range): Unit = {
      stageOneFile(ids.map(i => (i.toLong, i * 0.5)).toDF("id", "v"),
        src.resolve(f"in_$idx%02d.parquet"))
      src.resolve(f"in_$idx%02d.parquet").toFile
        .setLastModified(1000000L + idx * 10000L)
      ()
    }
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
        .withColumn("v2", $"v" * 2)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    stage(0, 0 until 500)
    run()
    assert(spark.read.parquet(out.toString).count() == 500L)
    // restart with one more input file: the seen-files log skips file 0,
    // the sink log gains exactly the new batch
    stage(1, 500 until 800)
    run()
    val ids = spark.read.parquet(out.toString).select($"id")
      .as[Long].collect().sorted
    assert(ids.length == 800 && ids.toSeq == (0L until 800L),
      s"expected exactly-once 0..799, got ${ids.length} rows")
    // a third restart with NO new input must be a no-op
    run()
    assert(spark.read.parquet(out.toString).count() == 800L)
    // orphan: a data-shaped file that never reached _spark_metadata
    // (crashed task, speculative duplicate). Directory listing sees it;
    // readers must not.
    val committed = java.nio.file.Files.list(out).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    val orphan = out.resolve("part-99999-orphan.c000.snappy.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(committed.head), orphan)
    val filesOnDisk = java.nio.file.Files.list(out).toArray.map(_.toString)
      .count(_.endsWith(".parquet"))
    assert(filesOnDisk == committed.length + 1)
    assert(spark.read.parquet(out.toString).count() == 800L,
      "reader must resolve _spark_metadata, not the directory listing")
    Seq(src, ckpt, out).foreach(deleteTree)
  }
}
