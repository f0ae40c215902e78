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

  // raw schema: ts is nanos-int64 in the parquet footer (readStream
  // needs an explicit schema; same conversion as Tables.events)
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  test("file-source stream reproduces the batch tumbling aggregate") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file stream sources watch a directory
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
