package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import StreamingFunnel.{FunnelTimes, StageEvent}

class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  private def replay(batches: Seq[Seq[StageEvent]], gapMs: Long)
      : Map[Long, (Option[Timestamp], Option[Timestamp], Option[Timestamp])] = {
    import spark.implicits._
    val input = MemoryStream[StageEvent](spark)
    val maxMin = batches.flatten.map(_.ts.getTime / 60000L).max
    val name = s"funnel_spec_${System.nanoTime()}"
    val q = StreamingFunnel.funnelStream(input.toDS(), gapMs)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // two punctuation batches: the watermark computed after batch N
      // finalizes state in batch N+1
      input.addData(Seq(StageEvent(-1L, ts(maxMin + 100000), -1)))
      q.processAllAvailable()
      input.addData(Seq(StageEvent(-2L, ts(maxMin + 200000), -1)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[FunnelTimes].collect()
      .filter(_.user_id >= 0)
      .groupBy(_.user_id).map { case (u, rows) =>
        assert(rows.length == 1, s"user $u emitted ${rows.length} rows")
        u -> (rows.head.t1, rows.head.t2, rows.head.t3)
      }.toMap
  }

  test("streaming funnel matches batch semantics across out-of-order micro-batches") {
    val gap = 60L * 60000L // 1 hour
    // watermark delay is 10 min: cross-batch inversions must stay inside
    // it (events below the watermark are dropped by contract)
    val out = replay(Seq(
      // batch 1: user 1's VIEW and PURCHASE arrive before its signup;
      // user 2's view arrives before any signup. wm after batch 1 =
      // 24m − 10m = 14m.
      Seq(StageEvent(1, ts(22), 1), StageEvent(1, ts(24), 2),
        StageEvent(2, ts(20), 1)),
      // batch 2: the signups arrive late but above the watermark —
      // user 1's at 16m PRECEDES its buffered view/purchase, so the
      // completed funnel is (16, 22, 24); user 2's at 21m follows its
      // view, which therefore cannot count
      Seq(StageEvent(1, ts(16), 0), StageEvent(2, ts(21), 0),
        // user 3: signup and view at the same instant — strict > rejects
        StageEvent(3, ts(16), 0), StageEvent(3, ts(16), 1))),
      gap)
    assert(out(1L) == ((Some(ts(16)), Some(ts(22)), Some(ts(24)))))
    assert(out(2L) == ((Some(ts(21)), None, None)))
    assert(out(3L) == ((Some(ts(16)), None, None)))
  }

  test("streaming funnel: inactivity gap splits episodes") {
    import spark.implicits._
    val gap = 30L * 60000L // 30 minutes
    val input = MemoryStream[StageEvent](spark)
    val name = s"funnel_split_${System.nanoTime()}"
    val q = StreamingFunnel.funnelStream(input.toDS(), gap)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // episode 1: signup+view; then >gap of silence (other users keep
      // the watermark moving); episode 2: purchase alone — a fresh
      // funnel that never saw a signup
      input.addData(Seq(StageEvent(7, ts(10), 0), StageEvent(7, ts(15), 1)))
      q.processAllAvailable()
      input.addData(Seq(StageEvent(99, ts(100), 0)))
      q.processAllAvailable()
      input.addData(Seq(StageEvent(7, ts(120), 2), StageEvent(99, ts(125), 1)))
      q.processAllAvailable()
      input.addData(Seq(StageEvent(-1, ts(100000), -1)))
      q.processAllAvailable()
      input.addData(Seq(StageEvent(-2, ts(200000), -1)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).as[FunnelTimes].collect()
      .filter(_.user_id == 7L).sortBy(_.t1.map(_.getTime).getOrElse(Long.MaxValue))
    assert(rows.length == 2, rows.mkString(","))
    assert(rows(0).t1 == Some(ts(10)) && rows(0).t2 == Some(ts(15)) &&
      rows(0).t3.isEmpty) // episode 1: purchase came after the gap
    assert(rows(1).t1.isEmpty && rows(1).t2.isEmpty && rows(1).t3.isEmpty)
  }

  test("ev_funnel_stream gate equals the batch per-user funnel times") {
    val dir = graft.TestSpark.sf0001
    val streamed = StreamingFunnel.evFunnelStream(spark, dir).collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap
    val batch = EventStreams.funnelTimes(graft.Tables.events(spark, dir),
      col("user_id"), col("ts"),
      Seq(col("event_type") === "signup", col("event_type") === "view",
        col("event_type") === "purchase")).collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap
    assert(streamed.keySet == batch.keySet)
    assert(streamed == batch)
  }

  test("k-generalized funnel (k=4): out-of-order stages fold exactly like batch") {
    import spark.implicits._
    val gap = 60L * 60000L
    val input = MemoryStream[StageEvent](spark)
    val name = s"funnel4_spec_${System.nanoTime()}"
    val q = StreamingFunnel.funnelStreamK(input.toDS(), 4, gap)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 completes all four stages, stages 2-3 arriving before
      // stage 1 within the watermark window (batch-1 max 24m -> wm 14m,
      // so the late signups at 16/17m are still admitted); user 2 has
      // no stage-2 event so stages 3-4 cannot count
      input.addData(Seq(StageEvent(1, ts(22), 1), StageEvent(1, ts(24), 2),
        StageEvent(2, ts(20), 2), StageEvent(2, ts(24), 3)))
      q.processAllAvailable()
      input.addData(Seq(StageEvent(1, ts(16), 0), StageEvent(1, ts(26), 3),
        StageEvent(2, ts(17), 0)))
      q.processAllAvailable()
      input.addData(Seq(StageEvent(-1L, ts(200000), -1)))
      q.processAllAvailable()
      input.addData(Seq(StageEvent(-2L, ts(300000), -1)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .filter($"user_id" >= 0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Timestamp](1)).toMap
    assert(rows(1L) == Seq(ts(16), ts(22), ts(24), ts(26)))
    assert(rows(2L) == Seq(ts(17), null, null, null))
    // equivalence with the k-generic BATCH operator on the same rows
    val batch = EventStreams.funnelTimes(
      Seq((1L, ts(22), 1), (1L, ts(24), 2), (2L, ts(20), 2),
        (2L, ts(24), 3), (1L, ts(16), 0), (1L, ts(26), 3), (2L, ts(17), 0))
        .toDF("user_id", "ts", "stage"),
      col("user_id"), col("ts"),
      (0 until 4).map(i => col("stage") === i))
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(i => r.getTimestamp(i))).toMap
    assert(rows.view.mapValues(_.toSeq).toMap ==
      batch.view.mapValues(_.toSeq).toMap)
  }

  test("per-stage horizons: batch and stream agree, out-of-horizon stages rejected") {
    import spark.implicits._
    val gap = 60L * 60000L
    val horizons = Seq(None, Some(5L * 60000000L), None) // stage 2 within 5 min
    val input = MemoryStream[StageEvent](spark)
    val name = s"funnel_h_spec_${System.nanoTime()}"
    val q = StreamingFunnel.funnelStreamK(input.toDS(), 3, gap,
        horizonsUs = horizons)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: view 4 min after signup (inside horizon) -> counts;
      // user 2: view 6 min after signup (outside) -> rejected, so the
      // purchase cannot anchor either
      input.addData(Seq(StageEvent(1, ts(10), 0), StageEvent(1, ts(14), 1),
        StageEvent(1, ts(15), 2),
        StageEvent(2, ts(10), 0), StageEvent(2, ts(16), 1),
        StageEvent(2, ts(17), 2)))
      q.processAllAvailable()
      input.addData(Seq(StageEvent(-1L, ts(200000), -1)))
      q.processAllAvailable()
      input.addData(Seq(StageEvent(-2L, ts(300000), -1)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .filter($"user_id" >= 0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Timestamp](1)).toMap
    assert(rows(1L) == Seq(ts(10), ts(14), ts(15)))
    assert(rows(2L) == Seq(ts(10), null, null))
    // batch twin on the same rows (horizon as an interval string)
    val batch = EventStreams.funnelTimesH(
      Seq((1L, ts(10), 0), (1L, ts(14), 1), (1L, ts(15), 2),
        (2L, ts(10), 0), (2L, ts(16), 1), (2L, ts(17), 2))
        .toDF("user_id", "ts", "stage"),
      col("user_id"), col("ts"),
      (0 until 3).map(i => col("stage") === i),
      Seq(None, Some("5 MINUTES"), None))
      .collect().map(r => r.getLong(0) ->
        (1 to 3).map(i => r.getTimestamp(i))).toMap
    assert(rows.view.mapValues(_.toSeq).toMap ==
      batch.view.mapValues(_.toSeq).toMap)
  }
}
