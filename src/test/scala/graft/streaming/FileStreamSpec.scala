package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end file-source streaming: the events parquet read as a
  * micro-batched stream must produce the SAME tumbling aggregate as the
  * batch path — Structured Streaming's unified-semantics contract. */
class FileStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file-source stream reproduces the batch tumbling aggregate") {
    // raw schema from the file footer (readStream needs an explicit
    // schema); Tables.normalizeEventTs adapts whatever ts type it has
    val rawSchema = graft.Tables.eventsRaw(spark, TestSpark.sf0001).schema
    // file stream sources watch a directory
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = graft.Tables.normalizeEventTs(spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString))
    val name = "file_stream_tumbling"
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name)
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = EventStreams.tumblingCounts(
      graft.Tables.events(spark, TestSpark.sf0001))
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq == batch.toSeq)
  }
}
