package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.EventStreams.Event

/** State-store hygiene at scale: the default HDFS-backed state store
  * keeps all state on the JVM heap — at production key cardinality that
  * means GC pressure and OOM on hot executors. RocksDB spills state to
  * local disk with bounded memory, the standard choice for large
  * stateful pipelines; this spec proves the build runs it end to end.
  * Plus the as-of-in-streaming pattern: per-micro-batch enrichment
  * through the native as-of join inside foreachBatch. */
class StreamingStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("RocksDB state store runs the watermarked tumbling aggregate") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event](spark)
      val out = EventStreams.streamingTumbling(input.toDF())
      val name = "rocksdb_tumbling"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(Seq(
          Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "click", 2.0)))
        q.processAllAvailable()
        input.addData(Seq(Event(3, ts(200), 2, "view", 4.0)))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table(name).collect()
      val firstHour = rows.find(r =>
        r.getAs[Timestamp]("window_start") == ts(0) &&
          r.getAs[String]("event_type") == "click")
      assert(firstHour.isDefined, rows.mkString(";"))
      assert(firstHour.get.getAs[Long]("n") == 2)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming minhash dedup suppresses near-identical docs within watermark") {
    import spark.implicits._
    // offset away from epoch 0: a row AT the initial watermark (0) is
    // treated as late by dropDuplicatesWithinWatermark and silently
    // dropped — epoch-adjacent event times are a real deployment footgun
    def ts(m: Long): Timestamp = new Timestamp((1440 + m) * 60000L)
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val reordered = base // identical text → identical signature
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val out = graft.operators.Dedup.streamingMinhashDedup(
      input.toDF().toDF("doc_id", "ts", "text"))
    val name = "mh_stream_dedup"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq((1L, ts(0), base), (2L, ts(1), other)))
      q.processAllAvailable()
      // same signature inside the watermark → suppressed
      input.addData(Seq((3L, ts(2), reordered)))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table(name).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"kept $kept")
  }

  test("as-of enrichment inside foreachBatch matches the batch join") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts(1), 10.0), (1L, ts(5), 11.0), (2L, ts(4), 50.0))
      .toDF("id", "qt", "price")
    val tradeRows = Seq((1L, ts(3)), (1L, ts(7)), (2L, ts(9)), (3L, ts(2)))

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Timestamp, Option[Double])]
    val input = MemoryStream[(Long, Timestamp)](spark)
    val q = input.toDF().toDF("id", "tt").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF()
        val joined = graft.plans.AsofJoinApi.joinAsof(b, quotes,
          Seq(b("id")), Seq(quotes("id")), b("tt"), quotes("qt"))
        collected.synchronized {
          collected ++= joined.collect().map(r => (r.getLong(0),
            r.getTimestamp(1),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        }
        ()
      }.start()
    try {
      input.addData(tradeRows.take(2)); q.processAllAvailable()
      input.addData(tradeRows.drop(2)); q.processAllAvailable()
    } finally q.stop()

    val trades = tradeRows.toDF("id", "tt")
    val expected = graft.plans.AsofJoinApi.joinAsof(trades, quotes,
      Seq(trades("id")), Seq(quotes("id")), trades("tt"), quotes("qt"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
    assert(collected.toSet == expected)
  }
}
