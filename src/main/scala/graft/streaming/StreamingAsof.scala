package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING as-of join: for each left event, the latest right row of
  * the same key with rightTime ≤ leftTime, within `toleranceMs` — the
  * unbounded-input form of graft.plans.AsofJoin, built on
  * `flatMapGroupsWithState` with event-time timeouts.
  *
  * The batch operator's doc already states the contract this class
  * cashes in: the tolerance bound IS the state-eviction bound. Per key
  * the state holds (a) left rows not yet past the watermark and (b)
  * right rows no older than watermark − tolerance; everything older can
  * neither match nor be matched, so state is bounded by rate ×
  * (watermark delay + tolerance) regardless of stream length.
  *
  * Emission is watermark-driven (append mode): a left row is emitted
  * once the watermark passes its timestamp — at that point no
  * still-to-arrive right row can have rightTime ≤ leftTime (late rows
  * are below the watermark by definition), so the match is final.
  */
object StreamingAsof {

  /** Union row for the two inputs: exactly one of `left_id` (left) or
    * `value` (right) is set. */
  final case class AsofEvent(key: Long, ts: Timestamp,
      left_id: Option[Long], value: Option[Double])
  final case class AsofState(
      lefts: List[(Long, Long)],           // (tsMs, left_id), ascending
      rights: List[(Long, Double)])        // (tsMs, value), ascending
  final case class AsofMatch(left_id: Long, key: Long, ts: Timestamp,
      asof_value: Option[Double], asof_ts: Option[Timestamp])

  def left(key: Long, ts: Timestamp, id: Long): AsofEvent =
    AsofEvent(key, ts, Some(id), None)
  def right(key: Long, ts: Timestamp, v: Double): AsofEvent =
    AsofEvent(key, ts, None, Some(v))

  /** The streaming query: `events` is the (already unioned) two-sided
    * input; output is one AsofMatch per left row, emitted when the
    * watermark finalizes it. */
  def joinAsofStream(events: Dataset[AsofEvent], toleranceMs: Long,
      watermark: String = "10 minutes"): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[AsofEvent], state: GroupState[AsofState]) =>
          val prev = state.getOption.getOrElse(AsofState(Nil, Nil))
          val incoming = it.toSeq
          val lefts = (prev.lefts ++ incoming.flatMap(e =>
            e.left_id.map(id => (e.ts.getTime, id)))).sortBy(_._1)
          val rights = (prev.rights ++ incoming.flatMap(e =>
            e.value.map(v => (e.ts.getTime, v)))).sortBy(_._1)
          val wm = state.getCurrentWatermarkMs()
          // finalize lefts strictly below the watermark: any future
          // right has ts > wm ≥ leftTs, so it cannot affect the match
          val (ready, pending) = lefts.partition(_._1 < wm)
          val out = ready.map { case (lt, id) =>
            val m = rights.takeWhile(_._1 <= lt)
              .lastOption.filter(_._1 >= lt - toleranceMs)
            AsofMatch(id, key, new Timestamp(lt),
              m.map(_._2), m.map(r => new Timestamp(r._1)))
          }
          // tolerance = eviction bound: rights older than wm − tolerance
          // cannot match any pending or future left (future lefts have
          // ts ≥ wm)
          val keptRights = rights.dropWhile(_._1 < wm - toleranceMs)
          if (pending.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsofState(pending, keptRights))
            // wake up when the watermark passes the oldest pending left
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.head._1 + 1)
          }
          out.iterator
      }
  }

  /** Gate-style harness: replay a bounded two-sided dataset through the
    * streaming query with a punctuation event (key outside the domain,
    * far-future timestamp) advancing the watermark so every real left
    * row finalizes — then compare against the batch as-of. Used by the
    * spec; production deployments run the same query unbounded. */
  def replayBounded(s: SparkSession, rows: Seq[AsofEvent],
      toleranceMs: Long): Dataset[AsofMatch] = {
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[AsofEvent](s)
    val maxMs = rows.iterator.map(_.ts.getTime).max
    val q = joinAsofStream(input.toDS(), toleranceMs)
      .writeStream.format("memory")
      .queryName("streaming_asof_replay")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      // two punctuation batches: watermark computed after batch N
      // evicts/finalizes in batch N+1
      input.addData(Seq(right(-1L, new Timestamp(maxMs + 100L * 3600 * 1000), 0.0)))
      q.processAllAvailable()
      input.addData(Seq(right(-2L, new Timestamp(maxMs + 200L * 3600 * 1000), 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    s.table("streaming_asof_replay").as[AsofMatch]
      .filter($"key" > 0)
  }
}
