package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.EventStreams.{Event, UserSession}

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  private def runStream[T](stream: MemoryStream[Event],
      out: org.apache.spark.sql.DataFrame, mode: OutputMode,
      batches: Seq[Seq[Event]]): Seq[org.apache.spark.sql.Row] = {
    val name = s"mem_${System.identityHashCode(out)}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("streaming tumbling counts with watermark emit finalized windows") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val out = EventStreams.streamingTumbling(input.toDF())
    val rows = runStream(input, out, OutputMode.Append(), Seq(
      Seq(Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "click", 2.0),
        Event(3, ts(61), 2, "view", 3.0)),
      // watermark advances past window [0h,1h) → it finalizes
      Seq(Event(4, ts(200), 2, "view", 4.0))))
    val firstHour = rows.find(r =>
      r.getAs[Timestamp]("window_start") == ts(0) &&
        r.getAs[String]("event_type") == "click")
    assert(firstHour.isDefined)
    assert(firstHour.get.getAs[Long]("n") == 2)
    assert(firstHour.get.getAs[Double]("sum_value") == 3.0)
  }

  test("streaming theta distinct: sketch state merges exactly across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val out = EventStreams.streamingDistinct(input.toDF())
    // users overlap across batches (11-20 arrive twice): the converged
    // window must count the UNION through the state-store sketch merge
    val b1 = (1 to 20).map(u => Event(u.toLong, ts(5), u.toLong, "c", 1.0))
    val b2 = (11 to 40).map(u =>
      Event(100L + u, ts(30), u.toLong, "c", 1.0))
    val rows = runStream(input, out, OutputMode.Complete(), Seq(b1, b2))
    val w0 = rows.filter(_.getAs[Timestamp]("window_start") == ts(0))
    assert(w0.size == 1)
    assert(w0.head.getAs[Long]("n") == 50L)
    // 40 distinct users < k=256 → KMV exact regime: estimate is exact
    assert(w0.head.getAs[Long]("theta_users") == 40L)
  }

  test("streaming kll quantiles: sketch state merges across micro-batches, exact regime") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val out = EventStreams.streamingQuantiles(input.toDF())
    // values 1..100 split across batches; 100 < k=200 keeps the merged
    // sketch in the exact (single-buffer) regime, so the median must sit
    // at the true discrete quantile of the UNION
    val b1 = (1 to 60).map(i => Event(i.toLong, ts(5), i.toLong, "c", i.toDouble))
    val b2 = (61 to 100).map(i => Event(i.toLong, ts(30), i.toLong, "c", i.toDouble))
    val rows = runStream(input, out, OutputMode.Complete(), Seq(b1, b2))
    val w0 = rows.filter(_.getAs[Timestamp]("window_start") == ts(0))
    assert(w0.size == 1)
    assert(w0.head.getAs[Long]("n") == 100L)
    val med = w0.head.getAs[Double]("kll_median")
    val p90 = w0.head.getAs[Double]("kll_p90")
    // rank envelope with a tight exact-regime bound: within one rank
    assert(med >= 49.0 && med <= 51.0, s"median $med")
    assert(p90 >= 89.0 && p90 <= 91.0, s"p90 $p90")
  }

  test("ev_quantiles gate: every window inside the rank envelope, counts intact") {
    val gate = EventStreams.evQuantiles(spark, TestSpark.sf0001)
    val rows = gate.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("median_ok"), s"median envelope failed: $r")
      assert(r.getAs[Boolean]("p90_ok"), s"p90 envelope failed: $r")
      assert(r.getAs[Boolean]("n_ok"), s"count mismatch: $r")
    }
  }

  test("streaming MG heavy hitters: counters merge across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val out = EventStreams.streamingTopUsers(input.toDF())
    // user 7 is heavy (30 events split across batches), 40 light users
    // appear once each — over k=16 capacity, so decrements fire; the
    // merged sketch must still retain the heavy user with a bound-tight
    // estimate (MG: est in [true - N/(k+1), true], N = 70)
    val b1 = (1 to 15).map(i => Event(i.toLong, ts(5), 7L, "c", 1.0)) ++
      (101 to 120).map(u => Event(u.toLong, ts(10), u.toLong, "c", 1.0))
    val b2 = (16 to 30).map(i => Event(i.toLong, ts(20), 7L, "c", 1.0)) ++
      (121 to 140).map(u => Event(u.toLong, ts(30), u.toLong, "c", 1.0))
    val rows = runStream(input, out, OutputMode.Complete(), Seq(b1, b2))
    val w0 = rows.filter(_.getAs[Timestamp]("window_start") == ts(0))
    assert(w0.size == 1 && w0.head.getAs[Long]("n") == 70L)
    val sk = w0.head.getAs[Array[Byte]]("sk")
    val items = graft.functions.MgKernel.deserialize(sk).sorted.toMap
    val bound = 70.0 / (EventStreams.HhWindowK + 1)
    assert(items.contains("7"), s"heavy user lost: $items")
    assert(items("7") <= 30L && items("7") >= 30L - bound,
      s"estimate ${items("7")} outside [${30 - bound}, 30]")
  }

  test("ev_top_users gate: retention and bounds hold in every window") {
    val gate = EventStreams.evTopUsers(spark, TestSpark.sf0001)
    val rows = gate.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("retained_ok"), s"retention failed: $r")
      assert(r.getAs[Boolean]("bounds_ok"), s"bounds failed: $r")
    }
  }

  test("streaming session windows merge events within gap") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val out = EventStreams.streamingSessions(input.toDF())
    val rows = runStream(input, out, OutputMode.Append(), Seq(
      Seq(Event(1, ts(0), 7, "a", 1.0), Event(2, ts(10), 7, "a", 1.0),
        Event(3, ts(100), 7, "a", 1.0)),
      Seq(Event(4, ts(500), 7, "a", 1.0)))) // pushes watermark far ahead
    // events at 0,10 merge (gap 10m < 30m); event at 100 is a new session
    val sessions = rows.filter(_.getAs[Long]("user_id") == 7L)
      .map(r => (r.getAs[Timestamp]("session_start"), r.getAs[Long]("n")))
    assert(sessions.contains((ts(0), 2L)))
    assert(sessions.contains((ts(100), 1L)))
  }

  test("sessions under the RocksDB state store equal the default-provider run") {
    // the gate asserts rocksdb* custom metrics internally (a silently
    // defaulted provider throws); here we also pin output equality to
    // the batch gaps-and-islands twin and that the toggle is restored
    val before = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    val got = EventStreams.evSessionsStreamRocksDb(spark, TestSpark.sf0001)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[Long]("user_id"), r.getAs[Long]("n"))).sortBy(t => (t._2, t._1.getTime))
    val want = EventStreams.evSessions(spark, TestSpark.sf0001)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[Long]("user_id"), r.getAs[Long]("n"))).sortBy(t => (t._2, t._1.getTime))
    assert(got.length == want.length && got.sameElements(want),
      s"RocksDB run diverged: ${got.length} vs ${want.length} sessions")
    assert(spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass") == before,
      "provider toggle must be restored after the gate")
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1, "a", 1.0), Event(2, ts(10), 1, "a", 2.0),
      Event(3, ts(120), 1, "a", 3.0), // gap > 30m closes first session
      Event(4, ts(0), 2, "b", 5.0)).toDS()
    val sessions: Seq[UserSession] =
      EventStreams.sessionize(events).collect().toSeq
    // batch mode emits only CLOSED sessions (open state never times out)
    assert(sessions.contains(UserSession(1, ts(0),
      new Timestamp(ts(10).getTime + EventStreams.SessionGapMs), 2, 3.0)))
    assert(!sessions.exists(s => s.user_id == 2)) // still open, not emitted
  }

  test("batch and streaming tumbling agree on the same data") {
    import spark.implicits._
    val batch = Seq(
      Event(1, ts(5), 1, "x", 1.5), Event(2, ts(30), 1, "x", 2.5),
      Event(3, ts(70), 2, "y", 1.0)).toDF()
    val rows = EventStreams.tumblingCounts(batch).collect()
    assert(rows.length == 2)
    val h0 = rows.find(_.getAs[Timestamp]("window_start") == ts(0)).get
    assert(h0.getAs[Long]("n") == 2 && h0.getAs[Double]("sum_value") == 4.0)
  }

  test("stream-stream interval join: purchases enriched with recent signups") {
    import spark.implicits._
    val purchases = MemoryStream[Event](spark)
    val signups = MemoryStream[Event](spark)
    // rename BEFORE withWatermark: aliasing afterwards can drop the
    // event-time tag from the renamed attribute
    val p = purchases.toDF()
      .select($"ts".as("p_ts"), $"user_id", $"value")
      .withWatermark("p_ts", "10 minutes")
    val s = signups.toDF()
      .select($"ts".as("s_ts"), $"user_id".as("s_user"))
      .withWatermark("s_ts", "10 minutes")
    // join purchases to a signup of the same user within the prior hour
    val joined = p.join(s,
      $"user_id" === $"s_user" &&
        $"p_ts" >= $"s_ts" && $"p_ts" <= $"s_ts" + expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.format("memory")
      .queryName("ss_join").outputMode("append").start()
    try {
      // NB: keep event times well above epoch 0 — the initial watermark
      // is 0, and rows at event-time <= watermark are dropped as late
      signups.addData(Seq(Event(1, ts(60), 42, "signup", 0.0)))
      q.processAllAvailable()
      purchases.addData(Seq(
        Event(2, ts(90), 42, "purchase", 9.99),   // within the hour -> joins
        Event(3, ts(150), 42, "purchase", 5.00))) // outside -> dropped
      q.processAllAvailable()
      // advance both watermarks so held state flushes
      signups.addData(Seq(Event(4, ts(2000), 7, "signup", 0.0)))
      purchases.addData(Seq(Event(5, ts(2000), 7, "purchase", 1.0)))
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .filter(org.apache.spark.sql.functions.col("user_id") === 42).collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Double]("value") == 9.99)
    } finally q.stop()
  }

  test("streamingAttribution: matches cross micro-batches, window enforced") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val out = EventStreams.streamingAttribution(input.toDF())
    val name = "attr_stream_spec"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // views arrive first; purchases land in a LATER micro-batch, so the
      // join must serve them from buffered state
      input.addData(Seq(
        Event(1, ts(60), 1, "view", 0.0),
        Event(2, ts(60), 2, "view", 0.0)))
      q.processAllAvailable()
      input.addData(Seq(
        Event(3, ts(90), 1, "purchase", 9.0),   // 30 min after the view
        Event(4, ts(60 + 361), 2, "purchase", 5.0))) // outside the 6h window
      q.processAllAvailable()
      val got = spark.table(name)
        .select($"user_id", $"view_id", $"purchase_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 1L, 3L)))
    } finally q.stop()
  }

  test("streaming attribution equals the batch join on a replayed corpus") {
    val batch = EventStreams.evAttribution(spark, graft.TestSpark.sf0001)
    val streamed = EventStreams.evAttributionStream(spark, graft.TestSpark.sf0001)
    assert(batch.count() > 0)
    assert(batch.exceptAll(streamed).isEmpty && streamed.exceptAll(batch).isEmpty)
  }

  test("late data beyond the watermark is dropped from finalized windows") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val out = EventStreams.streamingTumbling(input.toDF())
    val rows = runStream(input, out, OutputMode.Append(), Seq(
      Seq(Event(1, ts(65), 1, "click", 1.0)),
      // advances watermark to ts(190) > end of window [60,120)
      Seq(Event(2, ts(200), 1, "click", 1.0)),
      // late arrival for the already-finalized [60,120) window: dropped
      Seq(Event(3, ts(70), 1, "click", 99.0)),
      Seq(Event(4, ts(400), 1, "click", 1.0))))
    val w1 = rows.filter(_.getAs[Timestamp]("window_start") == ts(60))
    assert(w1.length == 1)
    assert(w1.head.getAs[Long]("n") == 1) // late event not counted
    assert(w1.head.getAs[Double]("sum_value") == 1.0)
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark keeps first occurrence") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val deduped = input.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory")
      .queryName("stream_dedup").outputMode("append").start()
    try {
      input.addData(Seq(
        Event(100, ts(60), 1, "a", 1.0), Event(100, ts(61), 1, "a", 2.0),
        Event(101, ts(62), 1, "b", 3.0)))
      q.processAllAvailable()
      input.addData(Seq(Event(100, ts(63), 1, "a", 4.0))) // dup within watermark
      q.processAllAvailable()
      val ids = spark.table("stream_dedup")
        .collect().map(_.getAs[Long]("event_id")).toSeq
      assert(ids.sorted == Seq(100L, 101L)) // one row per event_id
    } finally q.stop()
  }

  test("ev_sliding_stream gate equals the batch sliding aggregate") {
    val dir = graft.TestSpark.sf0001
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
    assert(rows(EventStreams.evSlidingStream(spark, dir)) ==
      rows(EventStreams.evSliding(spark, dir)))
  }

  test("funnel: stages only advance on strictly later events") {
    import spark.implicits._
    val events = Seq(
      // user 1: clean signup → view → purchase
      Event(1, ts(10), 1, "signup", 0), Event(2, ts(20), 1, "view", 0),
      Event(3, ts(30), 1, "purchase", 0),
      // user 2: view BEFORE signup only — stage 2 never reached
      Event(4, ts(5), 2, "view", 0), Event(5, ts(10), 2, "signup", 0),
      Event(6, ts(15), 2, "purchase", 0),
      // user 3: view at the SAME instant as signup — strict > rejects it
      Event(7, ts(10), 3, "signup", 0), Event(8, ts(10), 3, "view", 0),
      // user 4: never signs up
      Event(9, ts(10), 4, "view", 0), Event(10, ts(20), 4, "purchase", 0),
      // user 5: earliest-completion — the LATER view still counts, and
      // the purchase between signup and that view does not complete it
      Event(11, ts(10), 5, "signup", 0), Event(12, ts(15), 5, "purchase", 0),
      Event(13, ts(20), 5, "view", 0)).toDF()
    val times = EventStreams.funnelTimes(events, $"user_id", $"ts",
      Seq($"event_type" === "signup", $"event_type" === "view",
        $"event_type" === "purchase"))
      .collect().map(r => r.getAs[Long]("user") ->
        (Option(r.getAs[Timestamp]("t1")), Option(r.getAs[Timestamp]("t2")),
          Option(r.getAs[Timestamp]("t3")))).toMap
    assert(times(1L) == ((Some(ts(10)), Some(ts(20)), Some(ts(30)))))
    assert(times(2L) == ((Some(ts(10)), None, None)))
    assert(times(3L) == ((Some(ts(10)), None, None)))
    assert(times(4L) == ((None, None, None)))
    assert(times(5L) == ((Some(ts(10)), Some(ts(20)), None)))
  }

  test("funnel plans one exchange for k stages") {
    val plan = EventStreams.evFunnel(spark, graft.TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "ReusedExchange".r.findAllIn(plan).length
    assert(exchanges <= 2, // user-key shuffle + final single-row agg
      s"expected no per-stage shuffles in:\n$plan")
    val row = EventStreams.evFunnel(spark, graft.TestSpark.sf0001).head()
    assert(row.getAs[Long]("n_users") > 0)
    assert(row.getAs[Long]("n_signup") >= row.getAs[Long]("n_signup_view"))
    assert(row.getAs[Long]("n_signup_view") >= row.getAs[Long]("n_full_funnel"))
    assert(row.getAs[Long]("n_full_funnel") >= row.getAs[Long]("n_within_24h"))
  }
}
