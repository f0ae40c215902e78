package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.EventStreams.Event

/** foreachBatch: the production sink shape — per-micro-batch batch
  * writes (parquet here), enabling sinks Structured Streaming has no
  * native connector for, with the batch id available for idempotent
  * retry handling. */
class ForeachBatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(m: Long): Timestamp = new Timestamp(m * 60000L)

  test("foreachBatch lands every micro-batch in the parquet sink") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val outDir = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val seenBatches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seenBatches.add(id)
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    try {
      input.addData(Seq(Event(1, ts(1), 1, "a", 1.0), Event(2, ts(2), 1, "b", 2.0)))
      q.processAllAvailable()
      input.addData(Seq(Event(3, ts(3), 2, "c", 3.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(outDir)
    assert(rows.count() == 3)
    assert(rows.select("event_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(seenBatches.size >= 2) // one call per non-empty micro-batch
  }
}
