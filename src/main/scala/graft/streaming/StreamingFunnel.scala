package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.Tables

/** STREAMING ordered funnel: the unbounded-input form of
  * [[EventStreams.funnelTimes]], built on `flatMapGroupsWithState` with
  * event-time timeouts — per user, the earliest-completion stage times
  * t₁ < t₂ < … < t_k (strict order, same contract as the batch
  * operator), emitted once the user has been INACTIVE for `gapMs` of
  * event time (the sessionized-funnel contract: a user who returns
  * after the gap starts a fresh funnel episode).
  *
  * Why buffering is the correct state machine: stage events can arrive
  * OUT OF ORDER across micro-batches (a purchase in batch 1, the
  * signup that enables it in batch 2), so a naive "advance the stage
  * counter per event" machine is wrong. Instead events are buffered and
  * the greedy ascending scan — provably equal to the batch operator's
  * iterated window minima — runs over the sorted buffer.
  *
  * Why state stays SMALL at 100 TB rates: Spark's fMGWS filters input
  * older than the watermark, so once the watermark passes an event it
  * is final. The state therefore folds every buffered event below the
  * watermark into the k stage-time slots immediately (the greedy scan
  * is prefix-incremental: ascending finalized events extend it without
  * revisiting) and keeps ONLY in-flight events within the watermark
  * delay — k longs + (rate × watermark delay) events per live user,
  * independent of episode length. Eviction: the event-time timeout at
  * lastActivity + gap removes the user's state entirely on emission.
  */
object StreamingFunnel {

  val Stages = 3

  /** Input row: `stage` is the 0-based funnel-stage index of the event,
    * or -1 for a non-stage event (non-stage rows still advance the
    * watermark through `withWatermark` but neither extend nor split a
    * funnel episode — the inactivity clock runs on STAGE events). */
  final case class StageEvent(user_id: Long, ts: Timestamp, stage: Int)

  /** `done`: the current episode's stage times (MICROS; -1 = not
    * reached) — the folded final prefix. `hasEvents`: the episode has
    * folded at least one stage event (an episode of only non-qualifying
    * stage events still emits an all-null row, like the batch
    * operator's per-user rows). `lastFoldUs`: last folded stage event
    * (episode-boundary detection). `pending`: (tsUs, stage) still
    * inside the watermark. */
  final case class FunnelState(done: Seq[Long], hasEvents: Boolean,
      lastFoldUs: Long, pending: List[(Long, Int)])

  final case class FunnelTimes(user_id: Long, t1: Option[Timestamp],
      t2: Option[Timestamp], t3: Option[Timestamp])

  /** k-stage output row: `times(i)` is tᵢ₊₁ or null — the generalized
    * funnel's shape (arbitrary stage count, declared at call time). */
  final case class FunnelTimesK(user_id: Long, times: Seq[Timestamp])

  /** Timestamps cross the state machine as MICROSECONDS — `getTime`
    * alone would silently truncate the data's micros to millis, which
    * the gate's hash-equality with the batch oracle would catch. */
  private[streaming] def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  private[streaming] def toTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** One step of the greedy ascending fold: a stage-0 event fills t₀ if
    * empty; a stage-i event fills tᵢ if empty, STRICTLY after tᵢ₋₁, and
    * (when a horizon is set for stage i) at most `horizonsUs(i)` after
    * it. Applied in ascending (ts, stage) order this is exactly the
    * batch operator's earliest-anchor semantics, and it is
    * prefix-incremental: folded events never need revisiting. */
  private def foldOne(t: Array[Long], tsUs: Long, st: Int,
      horizonsUs: Seq[Option[Long]]): Unit =
    if (st >= 0 && st < t.length) {
      if (st == 0) { if (t(0) < 0) t(0) = tsUs }
      else if (t(st) < 0 && t(st - 1) >= 0 && t(st - 1) < tsUs &&
        horizonsUs(st).forall(h => tsUs <= t(st - 1) + h)) t(st) = tsUs
    }

  /** 3-stage funnel over the default [[Stages]] — the original gate
    * shape, now a thin adapter over the k-generic [[funnelStreamK]]. */
  def funnelStream(events: Dataset[StageEvent], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[FunnelTimes] = {
    import events.sparkSession.implicits._
    funnelStreamK(events, Stages, gapMs, watermark)
      .map(r => FunnelTimes(r.user_id, Option(r.times(0)),
        Option(r.times(1)), Option(r.times(2))))
  }

  /** GENERALIZED k-stage streaming funnel: identical state machine, the
    * stage count is a parameter — `stages` slots per user instead of a
    * fixed 3. Stage indices in [[StageEvent]] must be < `stages`. */
  def funnelStreamK(events: Dataset[StageEvent], stages: Int, gapMs: Long,
      watermark: String = "10 minutes",
      horizonsUs: Seq[Option[Long]] = Seq.empty): Dataset[FunnelTimesK] = {
    import events.sparkSession.implicits._
    require(stages >= 1, "funnel needs at least one stage")
    require(horizonsUs.isEmpty || horizonsUs.size == stages,
      "one horizon slot per stage (index 0 is ignored)")
    val horizons =
      if (horizonsUs.isEmpty) Seq.fill(stages)(None: Option[Long])
      else horizonsUs
    val gapUs = gapMs * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelTimesK](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, it, state) =>
          val prev = state.getOption.getOrElse(
            FunnelState(Seq.fill(stages)(-1L), hasEvents = false,
              Long.MinValue, Nil))
          val incoming = it.toSeq
          val all = (prev.pending ++ incoming.collect {
            case e if e.stage >= 0 => (micros(e.ts), e.stage)
          }).sorted
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // fold the final prefix (below the watermark — Spark filters
          // later arrivals below it, so the prefix never reopens) into
          // the stage slots; keep only in-flight events. This is the
          // state-compaction step: state = k slots + watermark window.
          val (fin, pending) = all.partition(_._1 < wmUs)
          val t = prev.done.toArray
          var has = prev.hasEvents
          var lastFold = prev.lastFoldUs
          val out = scala.collection.mutable.ListBuffer.empty[FunnelTimesK]
          def emit(): Unit = {
            out += FunnelTimesK(user, (0 until stages).map(i =>
              if (t(i) >= 0) toTimestamp(t(i)) else null))
            java.util.Arrays.fill(t, -1L)
            has = false
          }
          fin.foreach { case (tsUs, st) =>
            // an event-time gap splits episodes DURING the fold, so a
            // finalize and the next episode's first events can share an
            // invocation without merging
            if (has && tsUs > lastFold + gapUs) emit()
            foldOne(t, tsUs, st, horizons)
            has = true
            lastFold = tsUs
          }
          // inactivity clock: last stage event seen, folded or pending
          val lastSeenUs = (lastFold +: pending.map(_._1)).max
          if (pending.isEmpty &&
            (!has || wmUs > lastSeenUs + gapUs)) {
            if (has) emit()
            state.remove()
          } else {
            state.update(FunnelState(t.toSeq, has, lastFold, pending))
            state.setTimeoutTimestamp(lastSeenUs / 1000L + gapMs + 1)
          }
          out.iterator
      }
  }

  /** STREAMING-mode gate: the events parquet replays as ordered
    * micro-batches (staged file mtimes, maxFilesPerTrigger=1) followed
    * by two far-future punctuation files that advance the watermark past
    * every user's lastActivity + gap, draining all funnel episodes. The
    * 45-day gap exceeds the one-month data span, so every user's history
    * is ONE episode and the output must equal the batch per-user funnel
    * times exactly (same oracle CTE as `ev_funnel`, per-user form). */
  def evFunnelStream(s: SparkSession, dir: String): DataFrame =
    evFunnelStreamK(s, dir, Seq("signup", "view", "purchase"))

  /** GENERALIZED replay gate: the same staged-file drain harness for an
    * arbitrary ordered stage-type sequence; emits one row per user with
    * t1..tk columns. `ev_funnel_stream` is the 3-stage instance,
    * `ev_funnel4_stream` the 4-stage one — one code path for both. */
  def evFunnelStreamK(s: SparkSession, dir: String,
      stageTypes: Seq[String]): DataFrame = {
    import s.implicits._
    val raw = Tables.eventsRaw(s, dir)
    val maxUs = Tables.maxTsMicros(raw)
    val tsType = raw.schema("ts").dataType
    val src = java.nio.file.Files.createTempDirectory("graft_ev_funnel")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("00_events.parquet"))
    def writePunct(idx: Int, id: Long, days: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_fpunct$idx")
      Tables.punctDF(s, tsType,
          Seq((id, maxUs + days * 86400L * 1000000L, -1L * idx)))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")).sorted.head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        src.resolve(f"0${idx}_punct.parquet"))
      ()
    }
    writePunct(1, -1L, 100)
    writePunct(2, -2L, 200)
    Seq("00_events.parquet", "01_punct.parquet", "02_punct.parquet")
      .zipWithIndex.foreach { case (f, i) =>
        src.resolve(f).toFile.setLastModified(1000000L + i * 10000L)
      }
    val stream = Tables.normalizeEventTs(
      s.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString))
      .select(col("user_id"), col("ts"),
        stageTypes.zipWithIndex.foldLeft(lit(-1)) {
          case (acc, (tpe, i)) =>
            when(col("event_type") === tpe, i).otherwise(acc)
        }.as("stage"))
      .as[StageEvent]
    val name = s"ev_funnel_stream_${EventStreams.nextStreamRun()}"
    // state partitions from replayed bytes (clamped no-op at scale)
    val q = StreamTune.withAdaptivePartitions(s,
      StreamTune.dirBytes(src)) {
      funnelStreamK(stream, stageTypes.size, 45L * 86400000L)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
    }
    try q.processAllAvailable() finally {
      q.stop()
      val walk = java.nio.file.Files.walk(src)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
    // punctuation users are negative; filter at the sink (batch side)
    s.table(name).filter(col("user_id") >= 0)
      .select(col("user_id") +: stageTypes.indices.map(i =>
        col("times").getItem(i).as(s"t${i + 1}")): _*)
  }

  def evFunnel4Stream(s: SparkSession, dir: String): DataFrame =
    evFunnelStreamK(s, dir, Seq("signup", "click", "view", "purchase"))

  /** Per-user oracle: the same nested-window CTE as `ev_funnel`,
    * emitting the times instead of the counts. */
  val evFunnelStreamSql: String =
    """WITH s1 AS (SELECT user_id, ts, event_type,
      |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t1 FROM events),
      |  s2 AS (SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > t1
      |      THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM s1),
      |  s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2
      |      THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM s2)
      |SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
      |FROM s3 GROUP BY user_id""".stripMargin

  /** 4-stage oracle: one more link in the same CTE chain. */
  val evFunnel4StreamSql: String =
    """WITH s1 AS (SELECT user_id, ts, event_type,
      |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t1 FROM events),
      |  s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1
      |      THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM s1),
      |  s3 AS (SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > t2
      |      THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM s2),
      |  s4 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t3
      |      THEN ts END) OVER (PARTITION BY user_id) AS t4 FROM s3)
      |SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3,
      |  MAX(t4) AS t4
      |FROM s4 GROUP BY user_id""".stripMargin
}
